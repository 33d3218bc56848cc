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
    "q_modularity" -> Queries.qModularity _,
    "q_cpm" -> Queries.qCpm _,
    "q_media_meta" -> Queries.qMediaMeta _,
    "q_media_frames" -> Queries.qMediaFrames _,
    "q_emb_dedup" -> Queries.qEmbDedup _,
    "q_lsh_recall" -> Queries.qLshRecall _,
  )

  /** DuckDB-runnable oracles over the same parquet tables. Non-SQL-
    * expressible ops are omitted -> rows-only check: q_leiden (iterative
    * heuristic), q_minhash_lsh / q_simhash_near / q_fingerprint /
    * q_ann_lsh (xxhash64 has no DuckDB equivalent), q_media_meta
    * (synthetic in-engine table), q_lsh_recall (self-checking: the row
    * values ARE the planted-recall evidence). */
  def oracleSql: Map[String, String] = {
    val g = Queries.graphSqlPrelude

    // occurrences of ` word ` in ` text ` — the exact arithmetic of
    // TextOps.wordOccurrences (each non-overlapping replace of the
    // (w+2)-char needle with a single space removes w+1 chars)
    def ow(w: String): String =
      s"CAST((length(' ' || text || ' ') - " +
        s"length(regexp_replace(' ' || text || ' ', ' $w ', ' ', 'g'))) " +
        s"/ ${w.length + 1} AS BIGINT)"
    def owSum(ws: Seq[String]): String = ws.map(ow).mkString(" + ")
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "is"),
      "de" -> Seq("der", "und", "die", "ist"),
      "fr" -> Seq("le", "la", "et", "est"),
      "es" -> Seq("el", "los", "y", "es"),
      "zh" -> Seq("de", "shi", "zai", "he"))

    // one synchronous weighted-LPA round: argmax neighbor-label weight,
    // ties to the smallest label (TextOps counterpart: Queries.qLpa)
    def lpaIter(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT v, label FROM (
         |    SELECT a.src AS v, l.label,
         |      row_number() OVER (PARTITION BY a.src
         |        ORDER BY sum(a.weight) DESC, l.label ASC) AS rn
         |    FROM adj a JOIN $prev l ON a.dst = l.v
         |    GROUP BY a.src, l.label
         |  ) WHERE rn = 1
         |)""".stripMargin

    // connected components + the shared quality-prelude (modularity/CPM
    // are two aggregations over exact-integer sums, so the doubles are
    // bit-reproducible between Spark and DuckDB)
    val ccPrelude =
      s"""$g,
         |reach(v, r) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT a.dst, re.r FROM reach re JOIN adj a ON a.src = re.v
         |),
         |comp AS (SELECT v, min(r) AS c FROM reach GROUP BY v),
         |mm AS (SELECT sum(weight) AS m FROM canon),
         |win AS (
         |  SELECT coalesce(sum(e.weight), 0.0) AS w
         |  FROM canon e
         |  JOIN comp a ON a.v = e.src
         |  JOIN comp b ON b.v = e.dst
         |  WHERE a.c = b.c
         |)""".stripMargin

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

      "q_langid" -> {
        val occ = markers.map { case (lang, ws) =>
          s"SELECT doc_id, '$lang' AS lang, ${owSum(ws)} AS n FROM documents"
        }.mkString("\nUNION ALL ")
        s"""WITH occ AS (
           |$occ
           |),
           |best AS (
           |  SELECT doc_id, lang, n,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY n DESC, lang DESC) AS rn
           |  FROM occ
           |)
           |SELECT doc_id,
           |  CASE WHEN n > 0 THEN lang ELSE 'und' END AS lang_guess
           |FROM best WHERE rn = 1""".stripMargin
      },

      "q_quality" ->
        s"""WITH s AS (
           |  SELECT doc_id, text,
           |    CAST(length(text) - length(replace(text, ' ', '')) + 1
           |         AS DOUBLE) AS ntok,
           |    ${owSum(Seq("the", "a"))} AS stopn
           |  FROM documents
           |),
           |c AS (
           |  SELECT doc_id,
           |    CASE WHEN ntok < 5 THEN ntok / 5.0
           |         WHEN ntok > 1000 THEN 0.5 ELSE 1.0 END AS len_score,
           |    CASE WHEN (CAST(length(text) AS DOUBLE) / greatest(ntok, 1.0))
           |           BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.6 END AS word_score,
           |    least(CAST(stopn AS DOUBLE) / greatest(ntok, 1.0) * 5.0,
           |          1.0) AS stop_score,
           |    length(regexp_replace(text, '[a-zA-Z0-9]+', 'x', 'g')) AS nsub
           |  FROM s
           |)
           |SELECT doc_id,
           |  round(len_score * 0.4 + word_score * 0.3 + stop_score * 0.3, 4)
           |    AS quality,
           |  CAST(nsub AS BIGINT) AS n_subwords
           |FROM c""".stripMargin,

      "q_ann_brute" ->
        """WITH q AS (
          |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
          |  FROM embeddings WHERE vec_id < 10
          |),
          |c AS (
          |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
          |  FROM embeddings
          |),
          |scored AS (
          |  SELECT q.id AS query_id, c.id AS neighbor_id,
          |    list_dot_product(q.v, c.v) /
          |      (sqrt(list_dot_product(q.v, q.v)) *
          |       sqrt(list_dot_product(c.v, c.v))) AS cos
          |  FROM q, c WHERE q.id <> c.id
          |),
          |ranked AS (
          |  SELECT query_id, neighbor_id, cos,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY cos DESC, neighbor_id ASC) AS rank
          |  FROM scored
          |)
          |SELECT query_id, neighbor_id, round(cos, 6) AS cos,
          |  CAST(rank AS INT) AS rank
          |FROM ranked WHERE rank <= 5""".stripMargin,

      "q_lpa" -> {
        val iters = (1 to 10).map(i => lpaIter(s"l${i - 1}", s"l$i"))
          .mkString(",\n")
        s"""WITH $g,
           |l0 AS (SELECT v, v AS label FROM verts),
           |$iters
           |SELECT v, label FROM l10""".stripMargin
      },

      "q_modularity" ->
        s"""WITH RECURSIVE $ccPrelude,
           |deg AS (SELECT src AS v, sum(weight) AS d FROM adj GROUP BY 1),
           |cdeg AS (
           |  SELECT a.c, sum(d.d) AS cd
           |  FROM deg d JOIN comp a ON a.v = d.v GROUP BY 1
           |),
           |ss AS (SELECT sum(cd * cd) AS ss FROM cdeg)
           |SELECT round(win.w / mm.m - ss.ss / (4.0 * mm.m * mm.m), 6)
           |  AS modularity
           |FROM win, mm, ss""".stripMargin,

      "q_emb_dedup" ->
        """WITH e AS (
          |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
          |  FROM embeddings
          |)
          |SELECT a.id AS id_a, b.id AS id_b,
          |  round(list_dot_product(a.v, b.v) /
          |    (sqrt(list_dot_product(a.v, a.v)) *
          |     sqrt(list_dot_product(b.v, b.v))), 6) AS cos
          |FROM e a JOIN e b ON a.id < b.id
          |WHERE round(list_dot_product(a.v, b.v) /
          |    (sqrt(list_dot_product(a.v, a.v)) *
          |     sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35""".stripMargin,

      "q_cpm" ->
        s"""WITH RECURSIVE $ccPrelude,
           |sz AS (SELECT c, count(*) AS n FROM comp GROUP BY 1),
           |pairs AS (SELECT sum(n * (n - 1) / 2) AS p FROM sz)
           |SELECT round(win.w - 1.0 * pairs.p, 6) AS cpm
           |FROM win, pairs""".stripMargin,
    )
  }
}
