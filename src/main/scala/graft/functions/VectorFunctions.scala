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

  /** Native codegen'd squared L2 distance ([[ArrayL2Sq]]). */
  def l2sqN(a: Column, b: Column): Column = call_function("graft_l2", a, b)

  /** Squared L2 distance at double precision. */
  def l2sqD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dlt = x.cast("double") - y.cast("double")
        dlt * dlt
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane signature: for each ±1 hyperplane h (seeded), bit
    * i = sign(dot(v, h)) — the LSH key for approximate cosine search.
    * Native codegen expression ([[HyperplaneSignature]]): the sign matrix
    * is derived driver-side from the seed and embedded as a codegen
    * reference, so the per-row work is one sign-flip-add pass — no
    * per-element hashing, no interpreted HOF tree. Deterministic; no
    * broadcast state. */
  def hyperplaneSig(v: Column, bits: Int, dim: Int, seed: Long): Column =
    call_function("graft_hyperplane_sig", v, lit(bits), lit(seed))
}
