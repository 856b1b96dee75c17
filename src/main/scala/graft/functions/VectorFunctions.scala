package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` / `array<double>` columns.
  *
  * Built on Spark's higher-order array functions (`zip_with` + `aggregate`)
  * so the whole computation stays inside Catalyst — no UDF serialization,
  * and the sequential left-to-right accumulation is deterministic, which the
  * DuckDB oracle comparison relies on. Elements are cast to double before
  * multiplying so float inputs accumulate at double precision.
  *
  * Scale note: these are per-row scalar kernels (no shuffle). For ANN at
  * 100 TB the pre-filter is [[graft.ops.Similarity]]'s LSH bucketing; the
  * kernel here is only evaluated on candidate pairs.
  */
object VectorFunctions {
  /** Σ aᵢ·bᵢ at double precision. HOF formulation — works in any session;
    * prefer [[dotN]] in hot paths (bit-identical, codegen'd). */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ at double precision. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity at double precision (HOF formulation). */
  def cosineD(a: Column, b: Column): Column =
    dotD(a, b) / (normD(a) * normD(b))

  /** Native codegen'd dot product ([[ArrayDotProduct]]) — requires a
    * session built by [[graft.Sessions.builder]] (extension-injected). */
  def dotN(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Native codegen'd cosine similarity ([[ArrayCosineSim]]). */
  def cosineN(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Squared L2 distance at double precision. */
  def l2sqD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dlt = x.cast("double") - y.cast("double")
        dlt * dlt
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane signature: for each unit hyperplane h (seeded by
    * `seed`+i), bit i = sign(dot(v, h)). Returns an int bucket id with
    * `bits` bits — the LSH key for approximate cosine search. Hyperplane
    * components are derived per (i, j) from a splitmix-style integer hash
    * so the signature is deterministic and computable engine-side with no
    * broadcast state.
    */
  def hyperplaneSig(v: Column, bits: Int, dim: Int, seed: Long): Column = {
    // pseudo-random ±1 hyperplanes: sign((hash(seed, i, j) % 2)*2 - 1)
    // dot with ±1 components = sum of ± elements — cheap and codegen-able.
    val bitCols = (0 until bits).map { i =>
      val signed = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)), (x, j) => {
          val h = pmod(hash(lit(seed), lit(i), j), lit(2))
          when(h === 1, x.cast("double")).otherwise(-x.cast("double"))
        }),
        lit(0.0), (acc, x) => acc + x)
      when(signed >= 0, lit(1L << i)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }
}
