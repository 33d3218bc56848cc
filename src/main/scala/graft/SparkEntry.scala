package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: Leiden community detection over the link graph derived from
    * the sf0.001 tables; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qLeiden(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_degree" -> Queries.qDegree _,
    "q_compress" -> Queries.qCompress _,
    "q_triangles" -> Queries.qTriangles _,
    "q_triangles_pv" -> Queries.qTrianglesPerVertex _,
    "q_cc" -> Queries.qCc _,
    "q_pagerank" -> Queries.qPagerank _,
    "q_lpa" -> Queries.qLpa _,
    "q_leiden" -> Queries.qLeiden _,
    "q_dedup_exact" -> Queries.qDedupExact _,
    "q_text_stats" -> Queries.qTextStats _,
    "q_jaccard" -> Queries.qJaccard _,
    "q_minhash_lsh" -> Queries.qMinhashLsh _,
    "q_simhash_near" -> Queries.qSimhashNear _,
    "q_langid" -> Queries.qLangid _,
    "q_quality" -> Queries.qQuality _,
    "q_fingerprint" -> Queries.qFingerprint _,
    "q_ann_brute" -> Queries.qAnnBrute _,
    "q_ann_lsh" -> Queries.qAnnLsh _,
  )

  /** DuckDB-runnable oracles over the same parquet tables. Non-SQL-
    * expressible ops (leiden, lpa) are omitted -> rows-only check. */
  def oracleSql: Map[String, String] = {
    val g = Queries.graphSqlPrelude
    Map(
      "q_degree" ->
        s"""WITH $g
           |SELECT src AS v, sum(weight) AS deg FROM adj GROUP BY 1""".stripMargin,

      "q_compress" ->
        s"""WITH $g
           |SELECT src, dst, weight FROM canon""".stripMargin,

      "q_triangles" ->
        s"""WITH $g,
           |simple AS (SELECT src, dst FROM canon)
           |SELECT count(*) AS triangles
           |FROM simple e1
           |JOIN simple e2 ON e2.src = e1.dst
           |JOIN simple e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin,

      "q_triangles_pv" ->
        s"""WITH $g,
           |simple AS (SELECT src, dst FROM canon),
           |tri AS (
           |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
           |  FROM simple e1
           |  JOIN simple e2 ON e2.src = e1.dst
           |  JOIN simple e3 ON e3.src = e1.src AND e3.dst = e2.dst
           |),
           |membership AS (
           |  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
           |  UNION ALL SELECT c FROM tri
           |)
           |SELECT v.v, coalesce(m.n, 0) AS triangles
           |FROM verts v
           |LEFT JOIN (SELECT v, count(*) AS n FROM membership GROUP BY 1) m
           |  ON v.v = m.v""".stripMargin,

      "q_cc" ->
        s"""WITH RECURSIVE $g,
           |reach(v, r) AS (
           |  SELECT v, v FROM verts
           |  UNION
           |  SELECT a.dst, re.r FROM reach re JOIN adj a ON a.src = re.v
           |)
           |SELECT v, min(r) AS component FROM reach GROUP BY v""".stripMargin,

      "q_pagerank" -> {
        // 5 unrolled iterations of d=0.85 weighted PageRank; no dangling
        // vertices by construction (verts = vertices with edges)
        def iter(prev: String, cur: String): String =
          s"""$cur AS (
             |  SELECT vv.v,
             |         CAST(0.15 AS DOUBLE)/(SELECT n FROM nn)
             |         + CAST(0.85 AS DOUBLE)*coalesce(s.m, 0) AS rank
             |  FROM verts vv LEFT JOIN (
             |    SELECT sh.dst AS v, sum(sh.share * r.rank) AS m
             |    FROM shares sh JOIN $prev r ON sh.src = r.v GROUP BY 1
             |  ) s ON vv.v = s.v
             |)""".stripMargin
        s"""WITH $g,
           |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
           |wdeg AS (SELECT src AS v, sum(weight) AS wd FROM adj GROUP BY 1),
           |shares AS (
           |  SELECT a.src, a.dst, a.weight / w.wd AS share
           |  FROM adj a JOIN wdeg w ON a.src = w.v
           |),
           |r0 AS (SELECT v, 1.0/(SELECT n FROM nn) AS rank FROM verts),
           |${iter("r0", "r1")},
           |${iter("r1", "r2")},
           |${iter("r2", "r3")},
           |${iter("r3", "r4")},
           |${iter("r4", "r5")}
           |SELECT v, round(rank, 4) AS rank FROM r5""".stripMargin
      },

      "q_dedup_exact" ->
        """SELECT md5(text) AS text_hash, count(*) AS n,
          |       min(doc_id) AS keep_id
          |FROM documents GROUP BY 1""".stripMargin,

      "q_jaccard" ->
        """WITH words AS (
          |  SELECT doc_id AS id, unnest(string_split_regex(text, '\s+')) AS w
          |  FROM documents
          |),
          |dw AS (SELECT DISTINCT id, w FROM words WHERE length(w) > 0),
          |sizes AS (SELECT id, count(*) AS sz FROM dw GROUP BY 1),
          |pairs AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          |),
          |inter AS (
          |  SELECT p.id_a, p.id_b, count(*) AS i
          |  FROM pairs p
          |  JOIN dw x ON x.id = p.id_a
          |  JOIN dw y ON y.id = p.id_b AND y.w = x.w
          |  GROUP BY 1, 2
          |)
          |SELECT p.id_a, p.id_b,
          |  round(CAST(coalesce(i.i, 0) AS DOUBLE)
          |        / (sa.sz + sb.sz - coalesce(i.i, 0)), 6) AS jaccard
          |FROM pairs p
          |JOIN sizes sa ON sa.id = p.id_a
          |JOIN sizes sb ON sb.id = p.id_b
          |LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b""".stripMargin,

      "q_text_stats" ->
        """SELECT doc_id,
          |  length(text) AS n_chars_m,
          |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
          |  round(CAST(length(text)
          |        - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
          |        AS DOUBLE) / length(text), 4) AS punct_ratio
          |FROM documents""".stripMargin,
    )
  }
}
