package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Linkage

/** Oracle-checked queries for the record-linkage / entity-resolution
  * category (blocked fuzzy matching the reference engine's TODO:61-75
  * leaves to future work) plus Unicode text canonicalization.
  */
object LinkageQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Blocked Jaro-Winkler linkage over part names: block on
    // (p_brand, p_size), score every in-block pair with the native
    // codegen kernel, keep links >= 0.85. Scores are raw doubles —
    // the kernel is bit-pinned to DuckDB's jaro_winkler_similarity,
    // so the oracle hash-compare is exact.
    "q133_record_linkage" -> ((s, dir) => {
      Linkage.jaroWinklerLinks(
        t(s, dir, "part"), idCol = "p_partkey", textCol = "p_name",
        blockCols = Seq("p_brand", "p_size"),
        threshold = 0.85, maxBlock = 64)
    }),

    // Blocked edit-distance profile: Levenshtein distance histogram
    // over the same candidate space — the pre-linkage shape used to
    // pick a threshold.
    "q134_edit_histogram" -> ((s, dir) => {
      Linkage.editDistanceHistogram(
        t(s, dir, "part"), idCol = "p_partkey", textCol = "p_name",
        blockCols = Seq("p_brand", "p_size"), maxBlock = 64)
    }),

    // NFC canonicalization: every document gets a combining-mark
    // suffix ("e" + U+0301) appended, then normalized; NFC composes
    // the pair into precomposed U+00E9, so the code-point length
    // drops by exactly one vs the raw string. Exercises the
    // normalize-before-hash step of the dedup pipeline end-to-end
    // against the oracle's UAX #15 implementation.
    "q136_nfc_normalize" -> ((s, dir) => {
      import s.implicits._
      val suffixed = concat($"text", lit("e\u0301"))
      t(s, dir, "documents")
        .select($"doc_id",
          length(suffixed).as("n_raw"),
          length(Linkage.nfcNormalized(suffixed)).as("n_nfc"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q133_record_linkage" ->
      """WITH ok AS (SELECT p_brand, p_size FROM part
        |            GROUP BY 1, 2 HAVING count(*) <= 64),
        |p AS (SELECT p_partkey, p_name, part.p_brand, part.p_size
        |      FROM part JOIN ok ON part.p_brand = ok.p_brand
        |                       AND part.p_size = ok.p_size)
        |SELECT a.p_partkey AS id1, b.p_partkey AS id2,
        |  jaro_winkler_similarity(a.p_name, b.p_name) AS score
        |FROM p a JOIN p b ON a.p_brand = b.p_brand
        |                 AND a.p_size = b.p_size
        |                 AND a.p_partkey < b.p_partkey
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85""".stripMargin,

    "q134_edit_histogram" ->
      """WITH ok AS (SELECT p_brand, p_size FROM part
        |            GROUP BY 1, 2 HAVING count(*) <= 64),
        |p AS (SELECT p_partkey, p_name, part.p_brand, part.p_size
        |      FROM part JOIN ok ON part.p_brand = ok.p_brand
        |                       AND part.p_size = ok.p_size)
        |SELECT levenshtein(a.p_name, b.p_name) AS dist,
        |  count(*) AS n_pairs
        |FROM p a JOIN p b ON a.p_brand = b.p_brand
        |                 AND a.p_size = b.p_size
        |                 AND a.p_partkey < b.p_partkey
        |GROUP BY 1""".stripMargin,

    "q136_nfc_normalize" ->
      """SELECT doc_id,
        |  length(text || 'e' || chr(769)) AS n_raw,
        |  length(nfc_normalize(text || 'e' || chr(769))) AS n_nfc
        |FROM documents""".stripMargin
  )
}
