package graft.queries

/** DuckDB-SQL mirror of [[graft.expressions.Fnv64]] —
  * `signed(fmix64(fnv1a64(codepoints)))` rebuilt in pure SQL with
  * HUGEINT modular arithmetic. Extracted from the d05 fast-profile
  * oracle so every fast-hash gate row (d05 MinHash bands, t24
  * Count-Min cells) mirrors the ONE kernel instead of each query
  * re-deriving the limb algebra.
  */
private[queries] object FnvSql {

  /** Raw FNV-1a-64 over a VARCHAR column's code points, as a HUGEINT
    * in [0, 2^64) — the reduction loop of
    * [[graft.expressions.Fnv64Impl.fnv1a64]]. Per character: xor the
    * code point into the low 21 bits (code points < 2^21; BIGINT xor
    * on the low split, since HUGEINT has no xor), then multiply by
    * the FNV prime 2^40 + 435 as two in-range terms folded back
    * mod 2^64.
    */
  def raw(s: String): String = {
    val g = "(h - h % 2097152 + " +
      "xor(CAST(h % 2097152 AS BIGINT), CAST(c AS BIGINT)))"
    s"""list_reduce(
       list_prepend(CAST('14695981039346656037' AS HUGEINT),
         list_transform(range(1, length($s)+1),
           i -> CAST(unicode($s[i:i]) AS HUGEINT))),
       (h, c) -> ($g * 435 + $g % 16777216 * 1099511627776)
                 % CAST('18446744073709551616' AS HUGEINT))"""
  }

  /** `k xor (k >> 33)` on a HUGEINT-in-[0,2^64) COLUMN, via 32-bit
    * limbs (each fits BIGINT xor). */
  def xorShift33(k: String): String =
    s"""(xor(CAST($k // 4294967296 AS BIGINT),
             CAST($k // 8589934592 // 4294967296 AS BIGINT))
           * CAST(4294967296 AS HUGEINT)
         + xor(CAST($k % 4294967296 AS BIGINT),
               CAST($k // 8589934592 % 4294967296 AS BIGINT)))"""

  /** `k * (chi·2^32 + clo) mod 2^64` via widening limb products —
    * every intermediate < 2^66, far inside HUGEINT. */
  def mul64(k: String, clo: Long, chi: Long): String =
    s"""(($k % 4294967296 * $clo
         + ($k % 4294967296 * $chi + $k // 4294967296 * $clo)
           % 4294967296 * 4294967296)
        % CAST('18446744073709551616' AS HUGEINT))"""

  /** Staged CTE chain computing the full
    * `signed(fmix64(fnv1a64(fs)))` of [[graft.expressions.Fnv64]] —
    * one CTE per fmix step so each expression references a COLUMN
    * (inlining the whole cascade would blow the SQL up
    * exponentially). Output CTE `<p>5` carries `$keep, v` with v the
    * signed BIGINT Spark's long reinterprets to.
    */
  def stages(p: String, src: String, keep: String): String = {
    // fmix64 multiplier limbs: 0xff51afd7ed558ccd, 0xc4ceb9fe1a85ec53
    val (c1lo, c1hi) = (0xed558ccdL, 0xff51afd7L)
    val (c2lo, c2hi) = (0x1a85ec53L, 0xc4ceb9feL)
    s"""${p}0 AS (SELECT $keep, ${raw("fs")} AS k FROM $src),
       ${p}1 AS (SELECT $keep, ${xorShift33("k")} AS k FROM ${p}0),
       ${p}2 AS (SELECT $keep, ${mul64("k", c1lo, c1hi)} AS k FROM ${p}1),
       ${p}3 AS (SELECT $keep, ${xorShift33("k")} AS k FROM ${p}2),
       ${p}4 AS (SELECT $keep, ${mul64("k", c2lo, c2hi)} AS k FROM ${p}3),
       ${p}5 AS (SELECT $keep,
         CAST(CASE WHEN ${xorShift33("k")}
                >= CAST('9223372036854775808' AS HUGEINT)
           THEN ${xorShift33("k")}
                - CAST('18446744073709551616' AS HUGEINT)
           ELSE ${xorShift33("k")} END AS BIGINT) AS v FROM ${p}4)"""
  }
}
