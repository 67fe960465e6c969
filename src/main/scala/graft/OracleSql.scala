package graft

/** DuckDB-side cost control for the oracle gate.
  *
  * DuckDB (1.x) INLINES a plain CTE at every reference site. For the
  * unrolled iterative chains our heaviest oracles carry — q115/q125's
  * gradient-descent rounds (`z_r → p_r → g_{r+1} → w_{r+1}`, each
  * referencing `feat` and the previous round's weights) and the BPE
  * merge chains (`best_i` and `w_i` each referencing `w_{i-1}`) — that
  * inlining is EXPONENTIAL in the round count: expanding round r
  * re-expands every upstream round per reference. Measured at sf0.01,
  * the whole 135-oracle suite costs 1233 compare-seconds inlined vs
  * 149 with CTEs materialized (q125 286 s → 1.0 s, q117 172 s → 0.5 s,
  * q115 51 s → 0.1 s), with NO result change on any query — the gate's
  * empty-artifact failure mode (driver rounds 12/13) was this cost.
  *
  * The fix is a syntax-level rewrite applied once at [[SparkEntry
  * .oracleSql]] assembly: every named CTE `name AS (` becomes
  * `name AS MATERIALIZED (`, DuckDB's explicit materialization hint.
  * Semantics are unchanged by construction (a materialized CTE returns
  * the same rows, it just evaluates once); the full-suite A/B above
  * verified row-for-row equality empirically. The rewrite anchors on
  * the token BEFORE the CTE name — `WITH` or the `,` separating CTE
  * definitions — so a named-`WINDOW` clause (`WINDOW w AS (...)`,
  * q56) is NOT rewritten (DuckDB rejects MATERIALIZED there).
  */
object OracleSql {

  // (WITH | ,) <identifier> AS (  →  ... AS MATERIALIZED (
  // \bWITH\b keeps WITHIN/etc. out; the comma anchor is safe because a
  // comma-preceded `x AS (` is a CTE definition in every SQL position
  // our oracles use (verified over the full 135-oracle corpus).
  private val CteDef =
    """(?is)((?:\bWITH\b|,)\s*)([A-Za-z_][A-Za-z0-9_]*\s+AS)\s*\(""".r

  def materializeCtes(sql: String): String =
    CteDef.replaceAllIn(sql,
      m => java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)}${m.group(2)} MATERIALIZED ("))
}
