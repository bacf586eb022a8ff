package graft.queries

import graft.operators.DedupPortable

/** DuckDB replay SQL for the portable (md5-family) near-dup pipelines
  * in [[graft.operators.DedupPortable]] — the oracle side of q51/q52/
  * q57. Generated programmatically so the permutation constants, band
  * layout and hub-cut parameters are read from the SAME definitions the
  * Spark operators use; any drift breaks the hash compare immediately.
  *
  * Pattern precedent: q55/q56 (DedupSim.annOracleSql) replay the whole
  * ANN pipeline in SQL; these do the same for MinHash/SimHash/winnow.
  */
object DedupPortableSql {

  /** `CAST('0x' || substr(md5(x),1,n) AS BIGINT)` — DuckDB twin of
    * [[DedupPortable.md5Long]].
    */
  private def md5Long(x: String, hexChars: Int = 15): String =
    s"CAST('0x' || substr(md5($x), 1, $hexChars) AS BIGINT)"

  /** The shared hub-cut candidate CTEs (twin of Dedup.bandCandidates):
    * expects a prior CTE `src(doc_id, b, key)`; defines `${p}cand(idA,
    * idB)`. Buckets <= maxBucket take the bounded all-pairs self-join;
    * oversized buckets emit linear member -> min-id star edges. The
    * `p` prefix keeps two instantiations (e.g. the incremental
    * oracle's delta-delta pass) from colliding in one WITH clause.
    */
  private def hubCutCtes(maxBucket: Int, src: String = "banded",
                         p: String = ""): String =
    s"""${p}stats AS (
       |  SELECT b, key, count(*) AS bsz, min(doc_id) AS rep
       |  FROM $src GROUP BY b, key),
       |${p}sized AS (
       |  SELECT $src.doc_id, $src.b, $src.key, ${p}stats.bsz, ${p}stats.rep
       |  FROM $src JOIN ${p}stats ON $src.b = ${p}stats.b AND $src.key = ${p}stats.key),
       |${p}smallp AS (
       |  SELECT a.doc_id AS idA, c.doc_id AS idB
       |  FROM ${p}sized a JOIN ${p}sized c
       |    ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
       |  WHERE a.bsz <= $maxBucket),
       |${p}starp AS (
       |  SELECT rep AS idA, doc_id AS idB FROM ${p}sized
       |  WHERE bsz > $maxBucket AND doc_id <> rep),
       |${p}cand AS (
       |  SELECT DISTINCT idA, idB FROM
       |    (SELECT * FROM ${p}smallp UNION ALL SELECT * FROM ${p}starp))""".stripMargin

  /** Exact jaccard between two distinct-element lists. */
  private def jaccardSql(a: String, b: String): String =
    s"""CAST(len(list_intersect($a, $b)) AS DOUBLE)
       |      / len(list_distinct(list_concat($a, $b)))""".stripMargin

  /** MinHash signature columns (m0..m{numPerm-1}) over exploded shingle
    * hashes — twin of PortableExpr.minhashSig's affine family.
    */
  private def sigColsSql(numPerm: Int): String =
    DedupPortable.permConstants(numPerm).zipWithIndex.map { case ((a, b), j) =>
      s"min((((h & 2147483647) * $a + $b) & 2147483647)) AS m$j"
    }.mkString(",\n    ")

  /** CASE arms mapping band index -> md5Long band key over that band's
    * signature slots — twin of PortableExpr.minhashBandKeys.
    */
  private def bandArmsSql(numPerm: Int, bands: Int): String = {
    val rowsPerBand = numPerm / bands
    (0 until bands).map { bnd =>
      val slots = (0 until rowsPerBand)
        .map(r => s"m${bnd * rowsPerBand + r}::VARCHAR").mkString(", ")
      s"WHEN $bnd THEN ${md5Long(s"concat_ws('|', $slots)")}"
    }.mkString("\n      ")
  }

  /** The whole q51 pipeline as a reusable CTE-list prefix ending in
    * `pairs(idA, idB, jaccard)` (raw, unrounded jaccard; threshold
    * already applied) — shared by the pair oracle (q51) and the
    * cluster/survivorship oracles (q147/q148) so all three replay the
    * IDENTICAL pair source.
    */
  private def minhashPairsCtes(numPerm: Int, bands: Int, threshold: Double,
                               maxBucket: Int,
                               docsRel: String = "documents"): String = {
    val sigCols = sigColsSql(numPerm)
    val bandArms = bandArmsSql(numPerm, bands)
    s"""d0 AS (
       |  SELECT doc_id, list_sort(list_distinct(list_transform(
       |    list_transform(range(1, len(ws) - 1),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
       |    g -> ${md5Long("g")}))) AS hs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM $docsRel)),
       |d AS (SELECT * FROM d0 WHERE len(hs) > 0),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM d),
       |sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM ex GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, b,
       |    CASE b
       |      $bandArms
       |    END AS key
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, $bands)) AS b)),
       |${hubCutCtes(maxBucket)},
       |ver AS (
       |  SELECT cand.idA, cand.idB,
       |    ${jaccardSql("x.hs", "y.hs")} AS jaccard
       |  FROM cand JOIN d x ON x.doc_id = cand.idA
       |            JOIN d y ON y.doc_id = cand.idB),
       |pairs AS (
       |  SELECT idA, idB, jaccard FROM ver WHERE jaccard >= $threshold)""".stripMargin
  }

  /** q51 oracle: full MinHash-LSH replay (k=3 word shingles). */
  def minhashOracleSql(numPerm: Int, bands: Int, threshold: Double,
                       maxBucket: Int): String =
    s"""WITH ${minhashPairsCtes(numPerm, bands, threshold, maxBucket)}
       |SELECT idA, idB, round(jaccard, 4) AS jaccard
       |FROM pairs
       |ORDER BY idA, idB""".stripMargin

  /** q255 oracle: LSH pairs attributed to their (source, source)
    * provenance cell — which sources mirror each other.
    */
  def minhashProvenanceOracleSql(numPerm: Int, bands: Int, threshold: Double,
                                 maxBucket: Int): String =
    s"""WITH ${minhashPairsCtes(numPerm, bands, threshold, maxBucket)},
       |att AS (SELECT da.source AS sa, db.source AS sb
       |        FROM pairs p
       |        JOIN documents da ON p.idA = da.doc_id
       |        JOIN documents db ON p.idB = db.doc_id)
       |SELECT least(sa, sb) AS src_a, greatest(sa, sb) AS src_b,
       |  count(*) AS n_pairs
       |FROM att GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Recursive-CTE reachability over `pairs` -> `cl(id, rep)` with
    * rep = component minimum — the oracle twin of
    * [[graft.operators.Dedup.duplicateClusters]] (same shape as the
    * q48 oracle, but fed by the LSH pair source instead of capped
    * all-pairs).
    */
  private val reachabilityCtes: String =
    s"""e AS (SELECT idA AS a, idB AS b FROM pairs
       |      UNION SELECT idB, idA FROM pairs),
       |reach AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
       |  WHERE e2.b <> r.a),
       |cl AS (SELECT a AS id, least(a, min(b)) AS rep
       |       FROM reach GROUP BY a)""".stripMargin

  /** q147 oracle: LSH pairs -> transitive-closure clusters. */
  def minhashClustersOracleSql(numPerm: Int, bands: Int, threshold: Double,
                               maxBucket: Int): String =
    s"""WITH RECURSIVE ${minhashPairsCtes(numPerm, bands, threshold, maxBucket)},
       |$reachabilityCtes
       |SELECT id, rep FROM cl ORDER BY id""".stripMargin

  /** q148 oracle: LSH pairs -> clusters -> quality survivorship over
    * the FULL corpus (singletons are their own cluster), same pick as
    * the q71 oracle.
    */
  def minhashSurvivorOracleSql(numPerm: Int, bands: Int, threshold: Double,
                               maxBucket: Int): String =
    s"""WITH RECURSIVE ${minhashPairsCtes(numPerm, bands, threshold, maxBucket)},
       |$reachabilityCtes,
       |q AS (
       |  SELECT doc_id, ${TextQueries.qualitySql()} AS quality
       |  FROM documents),
       |asg AS (SELECT id, rep FROM cl
       |        UNION ALL
       |        SELECT doc_id, doc_id FROM q
       |        WHERE doc_id NOT IN (SELECT id FROM cl)),
       |rnk AS (
       |  SELECT asg.rep, asg.id, q.quality,
       |    row_number() OVER (PARTITION BY asg.rep
       |      ORDER BY q.quality DESC, asg.id ASC) AS rk
       |  FROM asg JOIN q ON asg.id = q.doc_id)
       |SELECT rep, max(CASE WHEN rk = 1 THEN id END) AS keep_id,
       |  max(CASE WHEN rk = 1 THEN quality END) AS kept_quality,
       |  count(*) AS family
       |FROM rnk GROUP BY rep ORDER BY rep""".stripMargin

  /** q209 oracle: LSH pairs -> clusters -> CLUSTER-KEYED hash split.
    * Every doc routes by md5 of its cluster rep (singletons by their
    * own id), so near-duplicates can never straddle train/val/test —
    * the leakage-safe variant of the q101 split. `moved` counts docs
    * whose naive doc_id-keyed split differs (the leakage the rep
    * keying prevented). Thresholds are the Ops.hashSplit hex
    * convention (cccccccc = floor(0.8*2^32), e6666666 = floor(0.9*2^32)).
    */
  def leakageSafeSplitOracleSql(numPerm: Int, bands: Int, threshold: Double,
                                maxBucket: Int, salt: String): String = {
    def splitCase(key: String): String =
      s"""CASE WHEN substr(md5(CAST($key AS VARCHAR) || '$salt'), 1, 8)
         |       < 'cccccccc' THEN 'train'
         |     WHEN substr(md5(CAST($key AS VARCHAR) || '$salt'), 1, 8)
         |       < 'e6666666' THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH RECURSIVE ${minhashPairsCtes(numPerm, bands, threshold, maxBucket)},
       |$reachabilityCtes,
       |asg AS (
       |  SELECT d.doc_id, coalesce(cl.rep, d.doc_id) AS rep
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.id),
       |sp AS (
       |  SELECT doc_id, rep,
       |    ${splitCase("rep")} AS split,
       |    ${splitCase("doc_id")} AS naive_split
       |  FROM asg)
       |SELECT split, count(*) AS n_docs, count(DISTINCT rep) AS n_clusters,
       |  count(CASE WHEN naive_split <> split THEN 1 END) AS moved,
       |  min(doc_id) AS min_id, max(doc_id) AS max_id
       |FROM sp GROUP BY split ORDER BY split""".stripMargin
  }

  /** q213 oracle: containment pairs over the snippet-planted bounded
    * corpus — shingle inverted index (single pseudo-band b=0) under
    * the shared hub-cut CTEs, exact containment
    * len(∩)/least(len A, len B) on the survivors.
    */
  def containmentOracleSql(threshold: Double, maxBucket: Int): String =
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 500),
       |corp AS (
       |  SELECT doc_id, text FROM base
       |  UNION ALL
       |  SELECT doc_id + 1000000,
       |    array_to_string(
       |      ws[1:greatest(3, CAST(floor(len(ws) / 3.0) AS INT))], ' ')
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM base WHERE doc_id % 7 = 0)),
       |d0 AS (
       |  SELECT doc_id, list_sort(list_distinct(list_transform(
       |    list_transform(range(1, len(ws) - 1),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
       |    g -> ${md5Long("g")}))) AS hs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM corp)),
       |d AS (SELECT * FROM d0 WHERE len(hs) > 0),
       |banded AS (SELECT doc_id, 0 AS b, unnest(hs) AS key FROM d),
       |${hubCutCtes(maxBucket)},
       |ver AS (
       |  SELECT cand.idA, cand.idB,
       |    CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
       |      / least(len(x.hs), len(y.hs)) AS c
       |  FROM cand JOIN d x ON x.doc_id = cand.idA
       |            JOIN d y ON y.doc_id = cand.idB)
       |SELECT idA, idB, round(c, 4) AS containment
       |FROM ver WHERE c >= $threshold
       |ORDER BY idA, idB""".stripMargin

  /** q218 oracle: incremental containment — delta = planted 1/3-prefix
    * snippets of every 10th doc (ids +1000000); corpus postings pruned
    * to delta shingle keys, hub thinning to min-id rep, delta-delta
    * via the shared hub-cut CTEs, containment verify, corpus-first
    * verdicts (the Dedup.incrementalVerdicts semantics with the
    * containment score).
    */
  def incrementalContainmentOracleSql(threshold: Double,
                                      maxBucket: Int): String =
    s"""WITH del AS (
       |  SELECT doc_id + 1000000 AS doc_id,
       |    array_to_string(
       |      ws[1:greatest(3, CAST(floor(len(ws) / 3.0) AS INT))], ' ') AS text
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM documents WHERE doc_id % 10 = 0)),
       |cs0 AS (
       |  SELECT doc_id, list_sort(list_distinct(list_transform(
       |    list_transform(range(1, len(ws) - 1),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
       |    g -> ${md5Long("g")}))) AS hs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |cset AS (SELECT * FROM cs0 WHERE len(hs) > 0),
       |ds0 AS (
       |  SELECT doc_id, list_sort(list_distinct(list_transform(
       |    list_transform(range(1, len(ws) - 1),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
       |    g -> ${md5Long("g")}))) AS hs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM del)),
       |dset AS (SELECT * FROM ds0 WHERE len(hs) > 0),
       |cex AS (SELECT doc_id, unnest(hs) AS key FROM cset),
       |dex AS (SELECT doc_id, unnest(hs) AS key FROM dset),
       |cpr AS (SELECT * FROM cex
       |        WHERE key IN (SELECT DISTINCT key FROM dex)),
       |cstats AS (
       |  SELECT key, count(*) AS bsz, min(doc_id) AS rep
       |  FROM cpr GROUP BY key),
       |cthin AS (
       |  SELECT cpr.doc_id, cpr.key
       |  FROM cpr JOIN cstats ON cpr.key = cstats.key
       |  WHERE cstats.bsz <= $maxBucket OR cpr.doc_id = cstats.rep),
       |xcand AS (
       |  SELECT DISTINCT cthin.doc_id AS idA, dex.doc_id AS idB
       |  FROM cthin JOIN dex ON cthin.key = dex.key),
       |banded AS (SELECT doc_id, 0 AS b, key FROM dex),
       |${hubCutCtes(maxBucket)},
       |allcand AS (
       |  SELECT idA, idB, 'corpus' AS src FROM xcand
       |  UNION ALL
       |  SELECT idA, idB, 'delta' AS src FROM cand),
       |allsets AS (
       |  SELECT doc_id, hs FROM cset UNION ALL SELECT doc_id, hs FROM dset),
       |ver AS (
       |  SELECT allcand.idA, allcand.idB, allcand.src,
       |    CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
       |      / least(len(x.hs), len(y.hs)) AS c
       |  FROM allcand JOIN allsets x ON x.doc_id = allcand.idA
       |               JOIN allsets y ON y.doc_id = allcand.idB),
       |m AS (
       |  SELECT idB AS id,
       |    CAST(count(CASE WHEN src = 'corpus' THEN 1 END) AS BIGINT) AS nc,
       |    CAST(count(CASE WHEN src = 'delta' THEN 1 END) AS BIGINT) AS nd,
       |    coalesce(min(CASE WHEN src = 'corpus' THEN idA END),
       |             min(CASE WHEN src = 'delta' THEN idA END)) AS dup_of,
       |    max(round(c, 4)) AS best_containment
       |  FROM ver WHERE c >= $threshold GROUP BY idB)
       |SELECT base.doc_id AS id,
       |  CASE WHEN coalesce(m.nc, 0) > 0 THEN 'dup_corpus'
       |       WHEN coalesce(m.nd, 0) > 0 THEN 'dup_delta'
       |       ELSE 'new' END AS status,
       |  m.dup_of,
       |  CAST(coalesce(m.nc, 0) AS BIGINT) AS n_corpus,
       |  CAST(coalesce(m.nd, 0) AS BIGINT) AS n_delta,
       |  m.best_containment
       |FROM (SELECT doc_id FROM del) base
       |LEFT JOIN m ON base.doc_id = m.id
       |ORDER BY id""".stripMargin

  /** q110 oracle: full replay of the incremental delta-vs-corpus pass
    * (DedupPortable.incrementalMinhashPortable). `deltaPred` is a SQL
    * predicate over `doc_id` selecting the delta batch; everything
    * else is corpus. Mirrors the Spark side exactly: corpus hub
    * thinning (oversized buckets -> min-id rep only), delta-delta via
    * the shared hub-cut CTEs, raw-jaccard threshold then round, and
    * corpus-first verdict with min-id dup_of.
    */
  /** `unionTail`: optional extra `UNION ALL SELECT …` rows appended to
    * the verdict relation BEFORE the final ORDER BY — q267 unions the
    * container's revisit-record verdicts with the incremental ones.
    */
  def incrementalOracleSql(numPerm: Int, bands: Int, threshold: Double,
                           maxBucket: Int, deltaPred: String,
                           unionTail: String = ""): String = {
    val sigCols = sigColsSql(numPerm)
    val bandArms = bandArmsSql(numPerm, bands)
    s"""WITH d0 AS (
       |  SELECT doc_id, list_sort(list_distinct(list_transform(
       |    list_transform(range(1, len(ws) - 1),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
       |    g -> ${md5Long("g")}))) AS hs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |d AS (SELECT * FROM d0 WHERE len(hs) > 0),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM d),
       |sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM ex GROUP BY doc_id),
       |allb AS (
       |  SELECT doc_id, b,
       |    CASE b
       |      $bandArms
       |    END AS key
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, $bands)) AS b)),
       |deltab AS (SELECT * FROM allb WHERE $deltaPred),
       |corpb AS (SELECT * FROM allb WHERE NOT ($deltaPred)),
       |cstats AS (
       |  SELECT b, key, count(*) AS bsz, min(doc_id) AS rep
       |  FROM corpb GROUP BY b, key),
       |cthin AS (
       |  SELECT corpb.doc_id, corpb.b, corpb.key
       |  FROM corpb JOIN cstats ON corpb.b = cstats.b AND corpb.key = cstats.key
       |  WHERE cstats.bsz <= $maxBucket OR corpb.doc_id = cstats.rep),
       |xcand AS (
       |  SELECT DISTINCT cthin.doc_id AS idA, deltab.doc_id AS idB
       |  FROM cthin JOIN deltab
       |    ON cthin.b = deltab.b AND cthin.key = deltab.key),
       |${hubCutCtes(maxBucket, "deltab", "dd")},
       |allcand AS (
       |  SELECT idA, idB, 'corpus' AS src FROM xcand
       |  UNION ALL
       |  SELECT idA, idB, 'delta' AS src FROM ddcand),
       |ver AS (
       |  SELECT allcand.idA, allcand.idB, allcand.src,
       |    ${jaccardSql("x.hs", "y.hs")} AS jaccard
       |  FROM allcand JOIN d x ON x.doc_id = allcand.idA
       |               JOIN d y ON y.doc_id = allcand.idB),
       |m AS (
       |  SELECT idB AS id,
       |    CAST(count(CASE WHEN src = 'corpus' THEN 1 END) AS BIGINT) AS nc,
       |    CAST(count(CASE WHEN src = 'delta' THEN 1 END) AS BIGINT) AS nd,
       |    coalesce(min(CASE WHEN src = 'corpus' THEN idA END),
       |             min(CASE WHEN src = 'delta' THEN idA END)) AS dup_of,
       |    max(round(jaccard, 4)) AS best_jaccard
       |  FROM ver WHERE jaccard >= $threshold GROUP BY idB)
       |SELECT base.doc_id AS id,
       |  CASE WHEN coalesce(m.nc, 0) > 0 THEN 'dup_corpus'
       |       WHEN coalesce(m.nd, 0) > 0 THEN 'dup_delta'
       |       ELSE 'new' END AS status,
       |  m.dup_of,
       |  CAST(coalesce(m.nc, 0) AS BIGINT) AS n_corpus,
       |  CAST(coalesce(m.nd, 0) AS BIGINT) AS n_delta,
       |  m.best_jaccard
       |FROM (SELECT doc_id FROM documents WHERE $deltaPred) base
       |LEFT JOIN m ON base.doc_id = m.id
       |$unionTail
       |ORDER BY id""".stripMargin
  }

  /** q52 oracle: full 60-bit SimHash replay. */
  def simhashOracleSql(maxDist: Int, maxBucket: Int): String = {
    val sums = (0 until 60)
      .map(b => s"sum((h >> $b) & 1) AS c$b").mkString(",\n    ")
    val fpTerms = (0 until 60).map { b =>
      s"(CASE WHEN c$b * 2 >= n THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
    }.mkString("\n    + ")
    s"""WITH ex AS (
       |  SELECT doc_id, ${md5Long("t")} AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |        FROM documents)),
       |cnt AS (
       |  SELECT doc_id, count(*) AS n,
       |    $sums
       |  FROM ex GROUP BY doc_id),
       |fps AS (
       |  SELECT doc_id,
       |    ($fpTerms) AS fp
       |  FROM cnt),
       |banded AS (
       |  SELECT doc_id, b, (fp >> (b * 15)) & 32767 AS key
       |  FROM fps CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
       |${hubCutCtes(maxBucket)},
       |ver AS (
       |  SELECT cand.idA, cand.idB,
       |    CAST(bit_count(xor(x.fp, y.fp)) AS INTEGER) AS dist
       |  FROM cand JOIN fps x ON x.doc_id = cand.idA
       |            JOIN fps y ON y.doc_id = cand.idB)
       |SELECT idA, idB, dist FROM ver WHERE dist <= $maxDist
       |ORDER BY idA, idB""".stripMargin
  }

  /** q157 oracle: the end-to-end corpus-curation recipe — language +
    * quality gate, the LSH near-dup pipeline over only the SURVIVING
    * docs, per-cluster best-quality keep (singletons keep themselves),
    * then a per-source corpus summary (docs, whitespace tokens,
    * decimal-exact average quality). Every stage reuses the generators
    * above, so the recipe replays the identical arithmetic end to end.
    */
  def corpusRecipeOracleSql(numPerm: Int, bands: Int, threshold: Double,
                            maxBucket: Int, lang: String,
                            minQuality: Double): String =
    s"""WITH RECURSIVE docs_f AS (
       |  SELECT doc_id, text, source, ${TextQueries.qualitySql()} AS q
       |  FROM documents
       |  WHERE lang = '$lang' AND ${TextQueries.qualitySql()} >= $minQuality),
       |${minhashPairsCtes(numPerm, bands, threshold, maxBucket, "docs_f")},
       |$reachabilityCtes,
       |asg AS (SELECT id, rep FROM cl
       |        UNION ALL
       |        SELECT doc_id, doc_id FROM docs_f
       |        WHERE doc_id NOT IN (SELECT id FROM cl)),
       |rnk AS (
       |  SELECT asg.rep, asg.id, d.q, d.source, d.text,
       |    row_number() OVER (PARTITION BY asg.rep
       |      ORDER BY d.q DESC, asg.id ASC) AS rk
       |  FROM asg JOIN docs_f d ON asg.id = d.doc_id),
       |keep AS (SELECT id, q, source, text FROM rnk WHERE rk = 1)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |  CAST(sum(CAST(round(q * 10000) AS BIGINT)) // count(*) AS BIGINT)
       |    AS avg_quality_e4
       |FROM keep GROUP BY source ORDER BY source""".stripMargin

  /** q149 oracle: image perceptual-hash dedup replay — RELATIONAL, no
    * image codec needed. The Spark side renders each quantized pixel
    * list as a real 8×8 PNG and average-hashes it through the ImageIo
    * codec; with one pixel per grid cell that round-trip is exact by
    * construction (PNG is lossless; luminance of gray (v,v,v) rounds
    * back to v — asserted in MultimodalSpec), so the oracle derives the
    * SAME 60-bit hash from the pixel ints directly, then replays the
    * 4×15-bit banding + hub cut + hamming verify.
    */
  def imagePhashOracleSql(maxDist: Int, maxBucket: Int): String = {
    val fpTerms = (0 until 60).map { b =>
      s"(CASE WHEN px[${b + 1}] * 64 > s THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
    }.mkString("\n    + ")
    s"""WITH base AS (
       |  SELECT vec_id, list_transform(embedding, e ->
       |    CAST(least(greatest(floor((CAST(e AS DOUBLE) + 1.0) * 127.5),
       |      0), 255) AS BIGINT)) AS px
       |  FROM embeddings),
       |imgs AS (
       |  SELECT vec_id * 2 AS doc_id, px FROM base
       |  UNION ALL
       |  SELECT vec_id * 2 + 1,
       |    list_transform(range(1, 65), i ->
       |      CASE WHEN i - 1 = vec_id % 64 THEN least(px[i] + 8, 255)
       |           ELSE px[i] END)
       |  FROM base),
       |summed AS (SELECT doc_id, px, list_sum(px) AS s FROM imgs),
       |fps AS (
       |  SELECT doc_id,
       |    ($fpTerms) AS fp
       |  FROM summed),
       |banded AS (
       |  SELECT doc_id, b, (fp >> (b * 15)) & 32767 AS key
       |  FROM fps CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
       |${hubCutCtes(maxBucket)},
       |ver AS (
       |  SELECT cand.idA, cand.idB,
       |    CAST(bit_count(xor(x.fp, y.fp)) AS INTEGER) AS dist
       |  FROM cand JOIN fps x ON x.doc_id = cand.idA
       |            JOIN fps y ON y.doc_id = cand.idB)
       |SELECT idA, idB, dist FROM ver WHERE dist <= $maxDist
       |ORDER BY idA, idB""".stripMargin
  }

  /** q161 oracle: audio fingerprint dedup replay — RELATIONAL, no
    * audio codec. The Spark side synthesizes each clip from quantized
    * sample ints (sv = 4·floor(e·4096), each held for 4 frames),
    * encodes real WAV bytes and hashes THROUGH WavCodec's windowed-RMS
    * feature path; constant-valued windows make that round-trip
    * reconstruct |sv| exactly (WavCodec.audioFingerprint60), so the
    * oracle derives the SAME 60-bit mean-energy hash from the ints
    * directly, then replays the 4×15-bit banding + hub cut + hamming
    * verify. Integer division is exact by construction (sv ≡ 0 mod 4),
    * so DuckDB's floor-`//` and Spark's truncating-`div` agree.
    */
  def audioFpOracleSql(maxDist: Int, maxBucket: Int): String = {
    val fpTerms = (0 until 60).map { b =>
      s"(CASE WHEN a[${b + 1}] * 60 > s THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
    }.mkString("\n    + ")
    s"""WITH base AS (
       |  SELECT vec_id, list_transform(embedding, e ->
       |    4 * CAST(floor(CAST(e AS DOUBLE) * 4096.0) AS BIGINT)) AS sv
       |  FROM embeddings),
       |clips AS (
       |  SELECT vec_id * 2 AS doc_id, sv FROM base
       |  UNION ALL
       |  SELECT vec_id * 2 + 1,
       |    list_transform(range(1, 65), i ->
       |      CASE WHEN i - 1 = vec_id % 60 THEN sv[i] // 4 ELSE sv[i] // 2 END)
       |  FROM base),
       |absed AS (
       |  SELECT doc_id, list_transform(sv, v -> abs(v)) AS a FROM clips),
       |summed AS (SELECT doc_id, a, list_sum(a[1:60]) AS s FROM absed),
       |fps AS (
       |  SELECT doc_id,
       |    ($fpTerms) AS fp
       |  FROM summed),
       |banded AS (
       |  SELECT doc_id, b, (fp >> (b * 15)) & 32767 AS key
       |  FROM fps CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),
       |${hubCutCtes(maxBucket)},
       |ver AS (
       |  SELECT cand.idA, cand.idB,
       |    CAST(bit_count(xor(x.fp, y.fp)) AS INTEGER) AS dist
       |  FROM cand JOIN fps x ON x.doc_id = cand.idA
       |            JOIN fps y ON y.doc_id = cand.idB)
       |SELECT idA, idB, dist FROM ver WHERE dist <= $maxDist
       |ORDER BY idA, idB""".stripMargin
  }

  /** q162 oracle: video frame-hash dedup replay — RELATIONAL, no video
    * codec. The Spark side renders each frame's 0/255 block grid from
    * embedding SIGNS (forced margin cells keep every averageHash64
    * decision far from the mean threshold, so the lossy MJPEG
    * round-trip provably lands on the planted bits — MultimodalSpec
    * verifies over the verify corpus), so the oracle derives each
    * 60-bit frame hash directly from the signs: bits 0-3 forced high,
    * 4-7 forced low, bit j (8..59) = sign(embedding[(j+16f) mod 64]).
    * Then the (position, hash) banding + hub cut + shared-position
    * verify replay exactly.
    */
  def videoFrameOracleSql(minShared: Int, maxBucket: Int): String = {
    val signTerms = (8 until 60).map { j =>
      s"(CASE WHEN CAST(embedding[(($j + 16 * f) % 64) + 1] AS DOUBLE) > 0" +
        s" THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString("\n    + ")
    s"""WITH frames AS (
       |  SELECT vec_id, f,
       |    (15 + $signTerms) AS fh
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 4)) AS f)),
       |banded AS (
       |  SELECT vec_id * 2 AS doc_id, f AS b, fh AS key FROM frames
       |  UNION ALL
       |  SELECT vec_id * 2 + 1, f,
       |    CASE WHEN f = vec_id % 4
       |         THEN xor(fh, (CAST(1 AS BIGINT)
       |                       << CAST(8 + vec_id % 52 AS INTEGER)))
       |         ELSE fh END
       |  FROM frames),
       |${hubCutCtes(maxBucket)},
       |arrays AS (
       |  SELECT doc_id, list(key ORDER BY b) AS fhs FROM banded GROUP BY doc_id),
       |ver AS (
       |  SELECT cand.idA, cand.idB,
       |    CAST(len(list_filter(range(1, 5), i -> x.fhs[i] = y.fhs[i]))
       |      AS INTEGER) AS shared
       |  FROM cand JOIN arrays x ON x.doc_id = cand.idA
       |            JOIN arrays y ON y.doc_id = cand.idB)
       |SELECT idA, idB, shared FROM ver WHERE shared >= $minShared
       |ORDER BY idA, idB""".stripMargin
  }

  /** q57 oracle: window-function winnowing replay. The position packing
    * `(h40 << 20) + max(0, 2^20-1-i)` makes `min(key)` the rightmost-min
    * selection; `key >> 20` recovers the hash.
    */
  def winnowOracleSql(k: Int, w: Int, threshold: Double,
                      maxBucket: Int): String = {
    s"""WITH base AS (
       |  SELECT doc_id, text, length(text) - ${k - 1} AS m
       |  FROM documents WHERE length(text) >= ${k + w - 1}),
       |pos AS (
       |  SELECT doc_id, m, i,
       |    (${md5Long(s"substr(text, CAST(i AS INTEGER), $k)", 10)} << 20)
       |      + greatest(0, 1048575 - i) AS key
       |  FROM (SELECT doc_id, m, text, unnest(range(1, m + 1)) AS i
       |        FROM base)),
       |sel0 AS (
       |  SELECT doc_id, i, m,
       |    min(key) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS mk
       |  FROM pos),
       |sel AS (
       |  SELECT DISTINCT doc_id, mk >> 20 AS f
       |  FROM sel0 WHERE i <= m - ${w - 1}),
       |fps AS (SELECT doc_id, list_sort(list(f)) AS fp FROM sel GROUP BY doc_id),
       |cnt AS (SELECT f, count(*) AS c FROM sel GROUP BY f),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
       |  FROM sel a JOIN sel b ON a.f = b.f AND a.doc_id < b.doc_id
       |  JOIN cnt ON cnt.f = a.f
       |  WHERE cnt.c BETWEEN 2 AND $maxBucket),
       |ver AS (
       |  SELECT cand.idA, cand.idB,
       |    ${jaccardSql("x.fp", "y.fp")} AS jaccard
       |  FROM cand JOIN fps x ON x.doc_id = cand.idA
       |            JOIN fps y ON y.doc_id = cand.idB)
       |SELECT idA, idB, round(jaccard, 4) AS jaccard
       |FROM ver WHERE jaccard >= $threshold
       |ORDER BY idA, idB""".stripMargin
  }
}
