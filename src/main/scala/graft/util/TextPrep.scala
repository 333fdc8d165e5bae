package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash primitives with exact DuckDB-SQL twins.
  *
  * Every helper has a Spark `Column` form and a SQL-fragment form producing
  * bit-identical results in DuckDB, so sketch-based operators (MinHash,
  * SimHash, winnowing fingerprints) can be verified by the driver's oracle
  * hash-compare rather than the weaker rows-only check.
  *
  * The engine-portable hash is `h48`: the first 12 hex digits of md5 as a
  * 48-bit integer. 48 bits keeps every value positive in a signed BIGINT in
  * both engines (bit 63 sign traps) while leaving collision probability at
  * ~n²/2⁴⁹ — negligible for dedup bucketing. md5 is available and identical
  * everywhere; this is deliberately NOT Spark's `hash()` (Murmur3, which
  * DuckDB cannot reproduce).
  */
object TextPrep {

  /** Whitespace tokens of lowercased text. */
  def tokens(c: Column): Column = split(lower(trim(c)), " +")
  def sqlTokens(x: String): String = s"string_split_regex(lower(trim($x)), ' +')"

  /** 48-bit md5-derived hash of a string. */
  def h48(c: Column): Column = conv(substring(md5(c), 1, 12), 16, 10).cast("long")
  def sqlH48(x: String): String = s"(('0x' || substr(md5($x), 1, 12))::BIGINT)"

  /** Positional word n-gram shingles ("a b c" 3-grams) of a token array.
    * (Guarded: Spark's `sequence(0, -1)` counts DOWN, so short docs need an
    * explicit empty-array branch.)
    *
    * PASS A MATERIALIZED COLUMN, never a raw `tokens(text)` expression:
    * the lambda references `toks` per element, so an inline expression
    * re-evaluates the whole split O(tokens) times per row (interpreted —
    * HOFs are CodegenFallback). Project the tokens into a named column
    * first; CollapseProject will not inline a non-cheap multi-referenced
    * alias, so the projection boundary holds. (The hashed LSH paths use
    * the fused [[graft.functions.TextHashFunctions.hashedShingles]] and
    * are immune.)
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  /** DuckDB twin (1-indexed lists; empty when fewer than n tokens). */
  def sqlShingles(toksExpr: String, n: Int): String = {
    val parts = (0 until n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1), i -> $parts)"
      .replace("t[", s"($toksExpr)[").replace("len(t)", s"len($toksExpr)")
  }
}
