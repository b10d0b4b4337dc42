package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's one consistent-sampling verdict: a 31-bit-masked Knuth
  * multiplicative hash bucket. Shared by the probabilistic sampler
  * (p23), the parser drop_ratio filter, and the dataset-mixing sampler
  * so the overflow-safety reasoning lives in exactly one place.
  *
  * The mask comes BEFORE the multiply: 2^31 · 2654435761 ≈ 5.7e18 <
  * Long.MaxValue, so the product cannot overflow — an unmasked key
  * ≥ ~3.47e9 (inevitable at 10^12 rows, or any hash-valued key) would
  * throw ARITHMETIC_OVERFLOW under Spark 4's default ANSI mode (the
  * scheme originally assumed wrapping arithmetic). A null key yields a
  * null bucket; callers decide the null policy (the drop-ratio filter
  * keeps null-keyed rows, the mixing sampler drops them). */
object ConsistentHash {
  def knuthBucket(key: Column, modulus: Int): Column =
    pmod(key.cast("bigint").bitwiseAND(lit(0x7FFFFFFFL)) * 2654435761L,
      lit(modulus))
}
