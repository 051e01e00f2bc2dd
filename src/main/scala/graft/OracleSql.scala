package graft

/** DuckDB oracle SQL for SparkEntry.queries (driver contract, SURVEY.md §5).
  *
  * Each statement is the ANSI-SQL twin of the Spark query with identical
  * column aliases, identical arithmetic structure (same fold order, same
  * decimal casts), and the same total ORDER BY. Approximate operators are
  * approximate in RECALL but deterministic in output: their seeded
  * constants (MinHash coefficients, LSH hyperplanes, IVF pivot hashes) are
  * inlined below so DuckDB recomputes the identical candidates.
  */
object OracleSql {

  /** Word-trigram shingle list from a pre-split word list `l`. */
  /** Distinct word n-grams of the token list `l` — the SQL spelling of
    * `TextOps.shingleSet` for any n (empty when the doc is shorter than
    * n tokens, matching the operator's empty-array arm).
    */
  private def wordGrams(n: Int): String = {
    val joined = (0 until n).map(o => if (o == 0) "l[i]" else s"l[i+$o]")
      .mkString("||' '||")
    s"list_distinct(list_transform(generate_series(1, len(l)-${n - 1}), i -> $joined))"
  }

  private val trigrams = wordGrams(3)

  /** q293's 8-round k-core peel, unrolled: each round recomputes
    * degrees over the surviving symmetric adjacency and keeps nodes of
    * degree ≥ k. The operator early-exits at the fixpoint; unrolling
    * the full bound is the identical result (post-fixpoint rounds are
    * no-ops). Recursive CTEs cannot express this (aggregation over the
    * recursive term), hence the generated chain.
    */
  private lazy val q293Sql: String = {
    val rounds = (0 until 8).map { r =>
      s"""k$r AS MATERIALIZED (SELECT a FROM e$r GROUP BY a HAVING count(*) >= 4),
         | e${r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e$r e
         |   JOIN k$r x ON e.a = x.a JOIN k$r y ON e.b = y.a)""".stripMargin
    }.mkString(",\n ")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       | raw AS (SELECT doc_id AS src, (doc_id * (t.i * 2 + 5) + t.i) % nn.n AS dst
       |   FROM documents, nn,
       |     unnest(generate_series(1, 1 + CAST(doc_id % 4 AS INT))) AS t(i)),
       | und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |   FROM raw WHERE src <> dst),
       | e0 AS MATERIALIZED (SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und),
       | $rounds
       |SELECT a AS node, CAST(count(*) AS BIGINT) AS core_deg
       |FROM e8 GROUP BY 1 ORDER BY node""".stripMargin
  }

  /** q302's deterministic label propagation, unrolled: per round, each
    * node adopts the most frequent neighbor label, frequency ties on
    * the smallest label. Labels tables MATERIALIZED (the q293Sql
    * inlining lesson). */
  /** Shared WITH-chain: the q302 synthetic graph (canonical undirected
    * `und`, symmetric `sym`) plus 4 unrolled LPA rounds ending at `l4`
    * — reused by q302 (the labels) and q316 (modularity OF them). */
  private lazy val lpaChainPrefix: String = {
    val rounds = (0 until 4).map { r =>
      s"""c$r AS (SELECT s.a AS node, l.lab, count(*) AS cnt
         |   FROM sym s JOIN l$r l ON l.node = s.b GROUP BY 1, 2),
         | l${r + 1} AS MATERIALIZED (SELECT node, min(lab) AS lab FROM (
         |   SELECT node, lab, cnt, max(cnt) OVER (PARTITION BY node) AS mx
         |   FROM c$r) WHERE cnt = mx GROUP BY 1)""".stripMargin
    }.mkString(",\n ")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       | raw AS (SELECT doc_id AS src, (doc_id * (t.i * 2 + 5) + t.i) % nn.n AS dst
       |   FROM documents, nn,
       |     unnest(generate_series(1, 1 + CAST(doc_id % 4 AS INT))) AS t(i)),
       | und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u,
       |   greatest(src, dst) AS v FROM raw WHERE src <> dst),
       | sym AS MATERIALIZED (SELECT u AS a, v AS b FROM und
       |   UNION ALL SELECT v, u FROM und),
       | l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM sym),
       | $rounds""".stripMargin
  }

  private lazy val q302Sql: String =
    lpaChainPrefix + "\nSELECT node, lab AS label FROM l4 ORDER BY node"

  /** q316: Newman modularity decomposition of the q302 LPA partition —
    * per-community internal edges + summed degrees over the SAME
    * graph, one HUGEINT floor per community. */
  private lazy val q316Sql: String = lpaChainPrefix +
    """,
      | mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
      | ein AS (SELECT la.lab AS label, CAST(count(*) AS BIGINT) AS e_in
      |  FROM und JOIN l4 la ON la.node = und.u
      |   JOIN l4 lb ON lb.node = und.v
      |  WHERE la.lab = lb.lab GROUP BY 1),
      | degs AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d
      |  FROM sym GROUP BY 1),
      | ds AS (SELECT l4.lab AS label, CAST(count(*) AS BIGINT) AS n_nodes,
      |   CAST(sum(coalesce(degs.d, 0)) AS BIGINT) AS deg_sum
      |  FROM l4 LEFT JOIN degs ON degs.node = l4.node GROUP BY 1)
      |SELECT ds.label, ds.n_nodes, COALESCE(ein.e_in, 0) AS e_in,
      | ds.deg_sum,
      | CAST(CASE WHEN mm.m > 0 THEN
      |   ((4 * CAST(mm.m AS HUGEINT) * COALESCE(ein.e_in, 0)
      |     - CAST(ds.deg_sum AS HUGEINT) * ds.deg_sum) * 1000000)
      |   // (4 * CAST(mm.m AS HUGEINT) * mm.m) END AS BIGINT)
      |   AS q_contrib_ppm
      |FROM ds LEFT JOIN ein ON ein.label = ds.label CROSS JOIN mm
      |ORDER BY ds.label""".stripMargin

  /** q317: degree assortativity over the symmetrized edge list, the
    * spearman signed-r² decomposition with the crossCorr magnitude
    * guard. */
  private lazy val q317Sql: String =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      | raw AS (SELECT doc_id AS src, (doc_id * (t.i * 2 + 5) + t.i) % nn.n AS dst
      |   FROM documents, nn,
      |     unnest(generate_series(1, 1 + CAST(doc_id % 4 AS INT))) AS t(i)),
      | und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      |   FROM raw WHERE src <> dst),
      | sym AS MATERIALIZED (SELECT u AS a, v AS b FROM und
      |   UNION ALL SELECT v, u FROM und),
      | degs AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d
      |  FROM sym GROUP BY 1),
      | j AS (SELECT dx.d AS x, dy.d AS y FROM sym
      |  JOIN degs dx ON dx.node = sym.a JOIN degs dy ON dy.node = sym.b),
      | agg AS (SELECT CAST(count(*) AS BIGINT) AS n_ends,
      |   CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |   sum(CAST(x AS HUGEINT) * x) AS qx,
      |   sum(CAST(y AS HUGEINT) * y) AS qy,
      |   sum(CAST(x AS HUGEINT) * y) AS qxy,
      |   CAST(max(x) AS HUGEINT) AS mx, CAST(max(y) AS HUGEINT) AS my
      |  FROM j),
      | v AS (SELECT n_ends, n_ends * qxy - sx * sy AS cov,
      |   n_ends * qx - sx * sx AS vx, n_ends * qy - sy * sy AS vy,
      |   mx, my FROM agg)
      |SELECT n_ends,
      | CAST(CASE WHEN CAST(n_ends AS HUGEINT) * n_ends * mx * my
      |     <= 300000000000000000 AND vx > 0 AND vy > 0 THEN
      |   (CASE WHEN cov < 0 THEN -1 ELSE 1 END)
      |   * (((cov * cov * 1000) // (vx * vy)) * 1000
      |      + (((cov * cov * 1000) % (vx * vy)) * 1000) // (vx * vy))
      |   END AS BIGINT) AS r2_signed_ppm
      |FROM v ORDER BY n_ends""".stripMargin

  /** q315's HITS rounds unrolled (the recursive term would need GROUP
    * BY): each round's authority side joins the prior hub scores, each
    * hub side the fresh authority scores, both max-normalized to ppm
    * with the operator's single truncating floor per node; every level
    * is referenced twice+ → MATERIALIZED (the q293 inlining lesson). */
  private lazy val q315Sql: String = {
    val rounds = (1 to 4).map { r =>
      s"""araw$r AS (SELECT e.dst AS node, CAST(sum(h${r - 1}.ppm) AS HUGEINT)
         |   AS raw FROM e JOIN h${r - 1} ON h${r - 1}.node = e.src GROUP BY 1),
         | amx$r AS (SELECT max(raw) AS mx FROM araw$r),
         | a$r AS MATERIALIZED (SELECT nodes.node,
         |   CAST(CASE WHEN amx$r.mx > 0
         |     THEN (COALESCE(araw$r.raw, 0) * 1000000) // amx$r.mx
         |     ELSE 0 END AS BIGINT) AS ppm
         |  FROM nodes LEFT JOIN araw$r ON araw$r.node = nodes.node
         |  CROSS JOIN amx$r),
         | hraw$r AS (SELECT e.src AS node, CAST(sum(a$r.ppm) AS HUGEINT)
         |   AS raw FROM e JOIN a$r ON a$r.node = e.dst GROUP BY 1),
         | hmx$r AS (SELECT max(raw) AS mx FROM hraw$r),
         | h$r AS MATERIALIZED (SELECT nodes.node,
         |   CAST(CASE WHEN hmx$r.mx > 0
         |     THEN (COALESCE(hraw$r.raw, 0) * 1000000) // hmx$r.mx
         |     ELSE 0 END AS BIGINT) AS ppm
         |  FROM nodes LEFT JOIN hraw$r ON hraw$r.node = nodes.node
         |  CROSS JOIN hmx$r)""".stripMargin
    }.mkString(",\n ")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       | raw0 AS (SELECT doc_id AS src,
       |    (doc_id * (t.i * 2 + 5) + t.i) % nn.n AS dst
       |   FROM documents, nn,
       |     unnest(generate_series(1, 1 + CAST(doc_id % 4 AS INT))) AS t(i)),
       | e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw0
       |   WHERE src <> dst),
       | nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
       |   SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       | h0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS ppm
       |   FROM nodes),
       | $rounds
       |SELECT nodes.node AS node, h4.ppm AS hub_ppm, a4.ppm AS auth_ppm
       |FROM nodes JOIN h4 ON h4.node = nodes.node
       | JOIN a4 ON a4.node = nodes.node
       |ORDER BY nodes.node""".stripMargin
  }

  /** q305's greedy farthest-point traversal, unrolled: round r picks
    * the not-yet-chosen row with max running min-L2² (ties on smaller
    * id), then tightens every row's min distance against it. The L2²
    * spelling is the VectorOps bit-parity contract verbatim. */
  private lazy val q305Sql: String = {
    val k = 8
    def l2(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), x -> (x[1]-x[2])*(x[1]-x[2])))"
    def chosenUpTo(r: Int): String =
      (Seq("SELECT id FROM cv1") ++ (2 until r).map(j => s"SELECT id FROM p$j"))
        .mkString(" UNION ALL ")
    val rounds = (2 to k).map { r =>
      val prev = if (r == 2) "d1" else s"d${r - 1}"
      s"""p$r AS MATERIALIZED (SELECT id, v, mind FROM $prev
         |   WHERE id NOT IN (${chosenUpTo(r)})
         |   ORDER BY mind DESC, id LIMIT 1),
         | d$r AS MATERIALIZED (SELECT d.id, d.v,
         |     least(d.mind, ${l2("d.v", "p.v")}) AS mind
         |   FROM $prev d, p$r p)""".stripMargin
    }.mkString(",\n ")
    val ranks = (2 to k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rank, p$r.id AS center_id, " +
        s"round(p$r.mind, 6) AS dist_sq FROM p$r")
      .mkString("\n UNION ALL ")
    s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       | cv1 AS MATERIALIZED (SELECT e.id, e.v FROM e
       |   WHERE e.id = (SELECT min(id) FROM e)),
       | d1 AS MATERIALIZED (SELECT e.id, e.v,
       |     ${l2("e.v", "c.v")} AS mind FROM e, cv1 c),
       | $rounds
       |SELECT CAST(1 AS BIGINT) AS rank, cv1.id AS center_id,
       |  CAST(NULL AS DOUBLE) AS dist_sq FROM cv1
       | UNION ALL $ranks
       |ORDER BY rank""".stripMargin
  }

  /** q308's Markov removal-effect attribution: journeys → floored-ppm
    * transitions → per-chain value iteration UNROLLED (the recursive
    * term would need GROUP BY — disallowed), one floor per state per
    * round, exactly the operator's driver solve. `chanExpr` is the
    * channel column (q312 derives a high-cardinality one); `bucketTopN`
    * replays [[graft.ops.Behavior.markovAttributionBucketed]]'s
    * graceful-degrade pre-pass (top-N channels by pre-truncation touch
    * volume keep identity, ties on name; the tail becomes __other__). */
  private def markovChainSql(chanExpr: String, bucketTopN: Option[Int]): String = {
    val iters = 24
    val remap = bucketTopN match {
      case Some(n) =>
        s""" tcnt AS (SELECT et, count(*) AS n FROM e0
           |   WHERE et <> 'purchase' GROUP BY 1),
           | topc AS MATERIALIZED (SELECT et FROM tcnt
           |   ORDER BY n DESC, et LIMIT $n),
           | e AS MATERIALIZED (SELECT u, sec,
           |    CASE WHEN et = 'purchase' OR et IN (SELECT et FROM topc)
           |      THEN et ELSE '__other__' END AS et, eid FROM e0),""".stripMargin
      case None => " e AS (SELECT * FROM e0),"
    }
    val steps = (1 to iters).map { k =>
      s"""v$k AS MATERIALIZED (
         |  SELECT v.chain, v.state,
         |    CASE WHEN v.state IN ('__conv__', '__drop__') THEN v.p
         |         ELSE COALESCE(nx.np, 0) END AS p
         |  FROM v${k - 1} v LEFT JOIN (
         |    SELECT t.chain, t.src AS state,
         |      CAST(sum(t.p * vv.p) // 1000000 AS BIGINT) AS np
         |    FROM tr t JOIN v${k - 1} vv
         |      ON vv.chain = t.chain AND vv.state = t.dst
         |    GROUP BY 1, 2) nx
         |    ON nx.chain = v.chain AND nx.state = v.state)""".stripMargin
    }.mkString(",\n ")
    s"""WITH e0 AS (SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
       |   $chanExpr AS et, event_id AS eid
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |    AND ($chanExpr) IS NOT NULL AND event_id IS NOT NULL),
       |$remap
       | cv AS (SELECT u, sec AS conv_sec, eid AS conv_id FROM (
       |   SELECT u, sec, eid,
       |     row_number() OVER (PARTITION BY u ORDER BY sec, eid) AS r
       |   FROM e WHERE et = 'purchase') WHERE r = 1),
       | tch AS (SELECT e.u, e.et,
       |    cv.conv_sec IS NOT NULL AS converted,
       |    row_number() OVER (PARTITION BY e.u ORDER BY e.sec, e.eid) AS rn
       |   FROM e LEFT JOIN cv ON cv.u = e.u
       |   WHERE e.et <> 'purchase' AND (cv.conv_sec IS NULL
       |     OR e.sec < cv.conv_sec
       |     OR (e.sec = cv.conv_sec AND e.eid < cv.conv_id))),
       | tc AS MATERIALIZED (SELECT * FROM tch WHERE rn <= 50),
       | mx AS (SELECT u, max(rn) AS mxrn, bool_or(converted) AS conv
       |   FROM tc GROUP BY 1),
       | tr0 AS (
       |   SELECT '__start__' AS src, et AS dst FROM tc WHERE rn = 1
       |   UNION ALL
       |   SELECT a.et, b.et FROM tc a JOIN tc b ON b.u = a.u AND b.rn = a.rn + 1
       |   UNION ALL
       |   SELECT tc.et, CASE WHEN mx.conv THEN '__conv__' ELSE '__drop__' END
       |   FROM tc JOIN mx ON mx.u = tc.u AND tc.rn = mx.mxrn
       |   UNION ALL
       |   SELECT '__start__', '__conv__' FROM cv
       |   WHERE cv.u NOT IN (SELECT u FROM tc)),
       | cnt AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
       |   FROM tr0 GROUP BY 1, 2),
       | ot AS MATERIALIZED (SELECT src, CAST(sum(n) AS BIGINT) AS tot
       |   FROM cnt GROUP BY 1),
       | pb AS MATERIALIZED (SELECT c.src, c.dst, (c.n * 1000000) // o.tot AS p
       |   FROM cnt c JOIN ot o ON o.src = c.src),
       | ch AS MATERIALIZED (SELECT DISTINCT s AS c FROM (
       |    SELECT src AS s FROM cnt UNION SELECT dst FROM cnt)
       |   WHERE s NOT IN ('__start__', '__conv__', '__drop__')),
       | chains AS MATERIALIZED (
       |   SELECT '__base__' AS chain UNION ALL SELECT c FROM ch),
       | tr AS MATERIALIZED (
       |   SELECT chs.chain, p.src, p.dst, p.p FROM chains chs
       |     JOIN pb p ON p.src <> chs.chain
       |   UNION ALL
       |   SELECT ch.c, ch.c, '__drop__', CAST(1000000 AS BIGINT) FROM ch),
       | sts AS (SELECT chains.chain, ss.s AS state FROM chains, (
       |    SELECT '__start__' AS s UNION ALL SELECT '__conv__'
       |    UNION ALL SELECT '__drop__' UNION ALL SELECT c FROM ch) ss),
       | v0 AS MATERIALIZED (SELECT chain, state,
       |    CAST(CASE WHEN state = '__conv__' THEN 1000000 ELSE 0 END
       |      AS BIGINT) AS p FROM sts),
       | $steps,
       | fin AS MATERIALIZED (SELECT chain, p FROM v$iters
       |   WHERE state = '__start__'),
       | bse AS (SELECT p FROM fin WHERE chain = '__base__'),
       | pos AS (SELECT CAST(sum(greatest(bse.p - f.p, 0)) AS BIGINT) AS tot
       |   FROM fin f, bse WHERE f.chain <> '__base__')
       |SELECT ch.c AS channel,
       | COALESCE((SELECT tot FROM ot WHERE ot.src = ch.c), 0) AS n_out,
       | bse.p AS base_conv_ppm, f.p AS removed_conv_ppm,
       | bse.p - f.p AS removal_ppm,
       | CAST(CASE WHEN pos.tot > 0 THEN
       |   (greatest(bse.p - f.p, 0) * 1000000) // pos.tot END AS BIGINT)
       |   AS share_ppm
       |FROM ch JOIN fin f ON f.chain = ch.c CROSS JOIN bse CROSS JOIN pos
       |ORDER BY channel""".stripMargin
  }

  private lazy val q308Sql: String = markovChainSql("event_type", None)

  /** q312: event_type × 13-way value bucket (up to 52 channels — past
    * the raw cap), degraded to top-10 + __other__ exactly as the
    * wrapper does. floor(double) is integral, so the BIGINT cast is
    * rounding-free in both engines. */
  private lazy val q312Sql: String = markovChainSql(
    "CASE WHEN event_type = 'purchase' THEN event_type" +
      " ELSE event_type || '_b' ||" +
      " CAST(abs(CAST(floor(coalesce(value, -1)) AS BIGINT)) % 13 AS VARCHAR)" +
      " END",
    Some(10))

  /** q295's additive Holt–Winters recurrence as a recursive CTE with
    * the seven season lanes as explicit columns. SQL lambdas/recursion
    * cannot bind intermediates, so `l_t` (which feeds its own lane,
    * the trend lane, and the updated season lane) and the season
    * lookup are INLINED textually — the exact strategy the Spark
    * operator documents, so both engines compute identical integer
    * ops. NOTE deliberately NOT DuckDB `list_reduce`: its struct
    * accumulator lanes observe partially-updated state (verified on
    * 1.0.0), which silently corrupts any multi-lane recurrence.
    */
  private lazy val q295Sql: String = {
    val m = 7
    val (a, b, g) = (300000, 100000, 200000)
    def slotCase(of: Int => String): String =
      (0 until m).map(j => s"WHEN $j THEN ${of(j)}")
        .mkString(s"CASE CAST((se.i - 1) % $m AS INT) ", " ", " END")
    val sOld = slotCase(j => s"rec.s$j")
    val yT = "se.y * 1000"
    val lNew =
      s"(($a * ($yT - $sOld) + ${1000000 - a} * (rec.l + rec.b)) // 1000000)"
    val sLanes = (0 until m).map { j =>
      s"""CASE WHEN CAST((se.i - 1) % $m AS INT) = $j
         |     THEN ($g * ($yT - $lNew) + ${1000000 - g} * rec.s$j) // 1000000
         |     ELSE rec.s$j END AS s$j""".stripMargin
    }.mkString(",\n    ")
    val initS = (0 until m).map(j =>
      s"CAST(max(CASE WHEN se.i = ${j + 1} THEN se.y END) * 1000 - max(l0.l0) AS BIGINT) AS s$j")
      .mkString(",\n    ")
    val fcSlot = (0 until m).map(j =>
      s"WHEN $j THEN fin.s$j")
      .mkString(s"CASE CAST((nn2.n_days + h.h - 1) % $m AS INT) ", " ", " END")
    s"""WITH RECURSIVE daily AS (SELECT event_type AS key,
       |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
       |   CAST(count(*) AS BIGINT) AS y
       |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
       |  GROUP BY 1, 2),
       | sp AS (SELECT key, min(day) AS d0, max(day) AS d1 FROM daily
        |  GROUP BY 1 HAVING max(day) - min(day) < 100000),
       | g AS (SELECT sp.key, gs.day, CAST(gs.day - sp.d0 + 1 AS BIGINT) AS i
       |  FROM sp, unnest(generate_series(sp.d0, sp.d1)) AS gs(day)),
       | se AS (SELECT g.key, g.i, coalesce(d.y, 0) AS y
       |  FROM g LEFT JOIN daily d ON d.key = g.key AND d.day = g.day),
       | nn2 AS (SELECT key, CAST(max(i) AS BIGINT) AS n_days FROM se
       |  GROUP BY 1 HAVING max(i) > $m),
       | l0 AS (SELECT key,
       |   CAST((sum(CASE WHEN i <= $m THEN y ELSE 0 END) * 1000) // $m AS BIGINT) AS l0
       |  FROM se GROUP BY 1),
       | rec AS (
       |  SELECT se.key, CAST($m AS BIGINT) AS i, max(l0.l0) AS l,
       |    CAST(0 AS BIGINT) AS b,
       |    $initS,
       |    CAST(0 AS BIGINT) AS sae
       |  FROM se JOIN l0 ON l0.key = se.key JOIN nn2 ON nn2.key = se.key
       |  GROUP BY 1
       |  UNION ALL
       |  SELECT se.key, se.i,
       |    $lNew AS l,
       |    (($b * ($lNew - rec.l) + ${1000000 - b} * rec.b) // 1000000) AS b,
       |    $sLanes,
       |    rec.sae + abs($yT - (rec.l + rec.b + $sOld)) AS sae
       |  FROM se JOIN rec ON se.key = rec.key AND se.i = rec.i + 1),
       | fin AS (SELECT rec.* FROM rec
       |   JOIN nn2 ON nn2.key = rec.key AND rec.i = nn2.n_days)
       |SELECT fin.key AS event_type, CAST(h.h AS BIGINT) AS h, nn2.n_days,
       | fin.l AS level_milli, fin.b AS trend_milli,
       | $fcSlot AS season_milli,
       | fin.sae AS sae_milli,
       | fin.l + h.h * fin.b + ($fcSlot) AS forecast_milli
       |FROM fin JOIN nn2 ON nn2.key = fin.key
       | CROSS JOIN (SELECT unnest(generate_series(1, $m)) AS h) h
       |ORDER BY event_type, h""".stripMargin
  }

  private val q01Inner =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS count_temp,
      | CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS start_sec
      |FROM events WHERE value > 30
      |GROUP BY user_id, floor(epoch(ts)/86400)
      |HAVING count(*) > 3""".stripMargin

  /** Shared CTE chain producing MinHash-LSH candidate pairs `px(id_a,
    * id_b)` — identical universal-hash constants as the Scala operator.
    */
  private lazy val minhashCtes: String = {
    val (as, bs) = graft.functions.Hashing.minhashParams(16)
    val p = graft.functions.Hashing.MinhashPrime
    s"""d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
       | sh AS (SELECT doc_id AS id, unnest($trigrams) AS sh FROM d),
       | hb AS (SELECT id, ('0x'||substr(md5('0:'||sh),1,8))::BIGINT AS h0 FROM sh),
       | h AS (SELECT id, j,
       |        min((([${as.mkString(",")}])[j+1]*h0 + ([${bs.mkString(",")}])[j+1]) % $p) AS mh
       |       FROM hb CROSS JOIN (SELECT unnest(generate_series(0,15)) AS j) g GROUP BY 1,2),
       | b AS (SELECT id, j//4 AS band, string_agg(mh::VARCHAR, ',' ORDER BY j) AS bkey
       |       FROM h GROUP BY 1,2),
       | px AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b
       |        FROM b a JOIN b c ON a.band = c.band AND a.bkey = c.bkey AND a.id < c.id)""".stripMargin
  }

  /** q142's merge-pair rank as a CASE chain over the FROZEN
    * `Bpe.sampleMerges` table (generated, so the Scala constant and the
    * SQL cannot drift — the `langHitsSql` pattern). `l`/`r` are SQL
    * expressions for the adjacent symbols; 999999 = "no rule".
    */
  private def bpeRankCase(l: String, r: String): String = {
    def esc(s: String) = s.replace("'", "''")
    "CASE " + graft.ext.Bpe.sampleMerges.zipWithIndex.map { case ((a, b), i) =>
      s"WHEN $l = '${esc(a)}' AND $r = '${esc(b)}' THEN $i"
    }.mkString(" ") + " ELSE 999999 END"
  }

  /** q131/q146's shared BM25 machinery — corpus stats, the per-(doc,
    * token) rounded weight CTE `bw`, and the fixed query-term table
    * `qq` — ONE definition so the fusion's lexical leg can never drift
    * from the ranked-retrieval oracle (the `qualityPpmSql` rule).
    */
  private lazy val bm25Ctes: String = {
    val k1 = 1.2; val b = 0.75
    s"""tk AS (SELECT doc_id AS id, string_split(text,' ') AS toks FROM documents),
       | dls AS (SELECT id, len(toks) AS dl FROM tk),
       | t AS (SELECT id, unnest(toks) AS token FROM tk),
       | tf AS (SELECT id, token, count(*) AS tf FROM t GROUP BY 1, 2),
       | df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       | st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |   CAST(sum(dl) AS BIGINT) AS sum_dl FROM dls),
       | bw AS (SELECT tf.id, tf.token,
       |   round(
       |     ln(1.0 + (CAST(st.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
       |     * (tf.tf * ${k1 + 1.0})
       |     / (tf.tf + $k1 * (${1.0 - b} + $b * dls.dl
       |        / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))), 6) AS w
       |   FROM tf JOIN df USING (token) JOIN dls ON tf.id = dls.id CROSS JOIN st),
       | qq AS (SELECT * FROM (VALUES (1,'spark'),(1,'window'),(1,'batch'),
       |   (2,'join'),(2,'filter'),
       |   (3,'stream'),(3,'table'),(3,'merge')) AS v(qid, token))""".stripMargin
  }

  private val cosExpr =
    "list_sum(list_transform(list_zip(qv, cv), x -> x[1]*x[2])) / " +
      "(sqrt(list_sum(list_transform(qv, x -> x*x))) * sqrt(list_sum(list_transform(cv, x -> x*x))))"

  /** q31's integer-exact quality-ppm formula over the `text` column —
    * ONE definition shared by q31/q108/q110 so the three oracles cannot
    * drift (the same role `minhashCtes` plays for cluster definitions).
    * Callers wrap with `CAST(... AS BIGINT)` / alias as needed.
    */
  /** q178's RFM-quintile oracle, shared verbatim with q320 (the
    * histogram-rank twin): one text, so the ntile semantics the two
    * engine paths must reproduce cannot drift apart.
    */
  private val rfmNtileSql: String =
    """WITH per AS (SELECT user_id,
      |    max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_t,
      |    count(*) AS frequency,
      |    sum(CAST(floor(value * 100) AS BIGINT)) AS monetary_cents
      |   FROM events
      |   WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
      |   GROUP BY 1),
      | g AS (SELECT max(last_t) AS gmax FROM per),
      | r AS (SELECT user_id, (g.gmax - last_t) // 86400 AS recency_days,
      |    frequency, monetary_cents FROM per, g),
      | qn AS (SELECT user_id, recency_days, frequency, monetary_cents,
      |    CAST(ntile(5) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_q,
      |    CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f_q,
      |    CAST(ntile(5) OVER (ORDER BY monetary_cents, user_id) AS BIGINT) AS m_q
      |   FROM r)
      |SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
      | CAST(frequency AS BIGINT) AS frequency,
      | CAST(monetary_cents AS BIGINT) AS monetary_cents,
      | r_q, f_q, m_q, r_q * 100 + f_q * 10 + m_q AS rfm_code
      |FROM qn ORDER BY user_id""".stripMargin

  /** q283's Qini-decile oracle, shared verbatim with q321 (the
    * histogram-rank twin) for the same no-drift reason.
    */
  private val upliftNtileSql: String =
    """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS unit,
      |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |   CAST(floor(value * 100) AS BIGINT) AS cents, event_type
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL AND event_type IS NOT NULL),
      | mx AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
      | u AS (SELECT unit,
      |   CAST(sum(CASE WHEN day <= mid THEN cents ELSE 0 END) AS BIGINT)
      |     AS score,
      |   max(CASE WHEN day > mid AND event_type = 'purchase'
      |     THEN 1 ELSE 0 END) AS y
      |  FROM e CROSS JOIN mx GROUP BY 1),
      | a AS (SELECT score, y,
      |   ('0x'||substr(md5('7:'||unit),1,8))::BIGINT % 2 AS arm,
      |   CAST(ntile(10) OVER (ORDER BY score DESC, unit) AS BIGINT)
      |     AS decile
      |  FROM u),
      | c AS (SELECT decile,
      |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
      |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
      |   CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS ct,
      |   CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS cc
      |  FROM a GROUP BY 1),
      | w AS (SELECT decile, nt, nc, ct, cc,
      |   sum(nt) OVER o AS nt_cum, sum(nc) OVER o AS nc_cum,
      |   sum(ct) OVER o AS ct_cum, sum(cc) OVER o AS cc_cum
      |  FROM c WINDOW o AS (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT decile, nt AS n_treat, nc AS n_control,
      | ct AS conv_treat, cc AS conv_control,
      | CAST(CASE WHEN nt > 0 AND nc > 0 THEN
      |   (ct * 1000000) // nt - (cc * 1000000) // nc END AS BIGINT)
      |   AS uplift_ppm,
      | CAST(CASE WHEN nc_cum > 0 THEN
      |   (CAST(ct_cum AS HUGEINT) * nc_cum
      |     - CAST(cc_cum AS HUGEINT) * nt_cum) * 1000 // nc_cum END
      |   AS BIGINT) AS qini_milli
      |FROM w ORDER BY decile""".stripMargin

  private val qualityPpmSql: String =
    "8000*least(len(string_split(text,' ')), 50)" +
      " + (300000*len(list_distinct(string_split(text,' ')))) // len(string_split(text,' '))" +
      " + least(300000, (300000*(length(text) - (len(string_split(text,' '))-1)))" +
      " // (8*len(string_split(text,' '))))"

  /** q32's per-language stopword-hit columns, GENERATED from
    * `TextOps.stopwords` — the Scala lists and the SQL can't disagree.
    * Shared by q32 and q108.
    */
  private lazy val langHitsSql: String =
    graft.ext.TextOps.stopwords.map { case (lang, ws) =>
      s"len(list_filter(string_split(text,' '), w -> ${ws.map(w => s"w='$w'").mkString(" OR ")})) AS ${lang}_h"
    }.mkString(",\n ")

  /** q32's argmax-with-first-tie-break CASE over the `*_h` hit columns,
    * generated from the same list order `TextOps.langId` folds in.
    */
  private lazy val langCaseSql: String = {
    val g = s"greatest(${graft.ext.TextOps.stopwords.map(_._1 + "_h").mkString(",")})"
    "CASE\n" + graft.ext.TextOps.stopwords.map { case (lang, _) =>
      s" WHEN ${lang}_h > 0 AND ${lang}_h >= $g THEN '$lang'"
    }.mkString("\n") + "\n ELSE 'und' END"
  }

  /** q40's LSH bucket id of DOUBLE[] column `v` — the same fixed-seed
    * hyperplane constants as `SimSearch.hyperplaneBucket` (JDK Random's
    * Gaussian sequence is specified, and Double.toString round-trips), so
    * DuckDB buckets identically bit-for-bit.
    */
  private lazy val lshBucketSql: String = lshBucketSqlSeeded(42L)

  /** The seed-parameterized twin of [[lshBucketSql]] — q38's banded
    * candidate generation uses one signature per band with seeds
    * 42..45, the exact constants `Dedup.embeddingNearDupPairs` folds in.
    */
  private def lshBucketSqlSeeded(seed: Long): String =
    graft.ext.SimSearch.hyperplanes(dim = 64, numPlanes = 6, seed).zipWithIndex.map {
      case (p, i) =>
        s"(CASE WHEN list_sum(list_transform(list_zip(v, ${p.mkString("[", ",", "]")}), " +
          s"x -> x[1]*x[2])) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  /** q41's rank-only pivot distance |p|² − 2·v·p (shared by corpus assign
    * and query probe CTEs).
    */
  private val pivotDist =
    "list_sum(list_transform(p.pv, x -> x*x)) - " +
      "2.0*list_sum(list_transform(list_zip(e.v, p.pv), x -> x[1]*x[2]))"

  /** q141's integer squared-L2 between a ppm vector (`e.v`) and a ppm
    * centroid (`p.pv`) — exact BIGINT arithmetic, so assignment ties and
    * ordering are engine-independent.
    */
  private val kmeansDist =
    "list_sum(list_transform(list_zip(e.v, p.pv), x -> (x[1]-x[2])*(x[1]-x[2])))"

  /** q141's deterministic k-means retraining chain, mirroring
    * `SimSearch.trainIvfCentroidsExact` round for round: fixed-point ppm
    * vectors, md5-hash-ordered initial pivots, `iters` Lloyd's rounds of
    * integer-L2 assignment (cent_id tie-break) + floor-of-mean centroid
    * updates, empty clusters keeping their previous centroid. Emits CTEs
    * `e` (ppm vectors), `dv` (double vectors for the cosine rerank), and
    * `p0..p$iters` (centroid generations) — change the Scala trainer and
    * this together or neither.
    */
  private def kmeansCtes(nlist: Int, iters: Int, dim: Int): String = {
    val init =
      s"""e AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
         |       x -> CAST(floor(x*1000000) AS BIGINT)) AS v FROM embeddings),
         | dv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | hp AS (SELECT vec_id, v,
         |        ('0x'||substr(md5('9:'||CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS hsh FROM e),
         | p0 AS (SELECT cent_id, pv FROM (
         |        SELECT v AS pv, CAST(row_number() OVER (ORDER BY hsh, vec_id) AS BIGINT) AS cent_id
         |        FROM hp) WHERE cent_id <= $nlist)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""a$t AS (SELECT vec_id, v, cent_id FROM (
         |        SELECT e.vec_id, e.v, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $kmeansDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p${t - 1} p) WHERE cr = 1),
         | s$t AS (SELECT cent_id, i, CAST(floor(sum(v[i]) * 1.0 / count(*)) AS BIGINT) AS cm
         |        FROM a$t, (SELECT unnest(generate_series(1, $dim)) AS i) g GROUP BY cent_id, i),
         | n$t AS (SELECT cent_id, list(cm ORDER BY i) AS nv FROM s$t GROUP BY cent_id),
         | p$t AS (SELECT p.cent_id, COALESCE(n.nv, p.pv) AS pv
         |        FROM p${t - 1} p LEFT JOIN n$t n ON p.cent_id = n.cent_id)""".stripMargin
    }
    (init +: rounds).mkString(",\n ")
  }

  val all: Map[String, String] = Map(
    "q01_tumble_alerts" ->
      s"$q01Inner\nORDER BY start_sec, user_id",

    "q02_tumble_avg_parts" ->
      """SELECT user_id, avg_temp, start_sec,
        | year(make_timestamp(start_sec*1000000)) AS "year",
        | month(make_timestamp(start_sec*1000000)) AS "month",
        | dayofmonth(make_timestamp(start_sec*1000000)) AS "day",
        | hour(make_timestamp(start_sec*1000000)) AS "hour"
        |FROM (
        |  SELECT user_id,
        |   CAST(floor(epoch(ts)/900)*900 AS BIGINT) AS start_sec,
        |   CAST(sum(CAST(floor(value) AS BIGINT)) // count(*) AS BIGINT) AS avg_temp
        |  FROM events GROUP BY 1, 2)
        |ORDER BY start_sec, user_id""".stripMargin,

    "q03_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q04_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | sum(l_quantity)/count(*) AS avg_qty,
        | CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q05_join_agg" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q06_join5_revenue" ->
      """SELECT r_name, n_name,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q07_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,

    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q09_outer_join_count" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY 1, 2",

    "q11_rollup" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name)
        |ORDER BY n_name NULLS FIRST""".stripMargin,

    "q12_cube" ->
      """SELECT event_type, user_id % 10 AS user_mod, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY CUBE(event_type, user_id % 10)
        |ORDER BY event_type NULLS FIRST, user_mod NULLS FIRST""".stripMargin,

    "q13_rank_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q14_running_sum" ->
      """SELECT user_id, event_id,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q15_topk_orderby" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q16_union" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |UNION
        |SELECT user_id FROM events WHERE value > 200
        |ORDER BY user_id""".stripMargin,

    "q17_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE value > 200
        |ORDER BY user_id""".stripMargin,

    "q18_except" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE value > 200
        |ORDER BY user_id""".stripMargin,

    "q19_date_parts" ->
      """SELECT year(o_orderdate) AS "year", month(o_orderdate) AS "month",
        | CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q20_alert_messages" ->
      s"""SELECT user_id, start_sec,
         | 'Sensor Id: '||user_id||' has exceeded the set threshold at the window start time: '
         |   ||strftime(make_timestamp(start_sec*1000000), '%Y-%m-%dT%H:%M:%S') AS message
         |FROM (
         |$q01Inner
         |) ORDER BY start_sec, user_id""".stripMargin,

    "q21_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q22_case_math" ->
      """SELECT CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid' ELSE 'high' END AS bucket,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q24_derived_having" ->
      """SELECT user_id,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_val
        |FROM events GROUP BY 1
        |HAVING CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/count(*) > 60
        |ORDER BY user_id""".stripMargin,

    "q25_sliding_window" ->
      """SELECT CAST((floor(epoch(ts)/1800) - o)*1800 AS BIGINT) AS start_sec,
        | CAST(count(*) AS BIGINT) AS n
        |FROM events CROSS JOIN (VALUES (0),(1)) t(o)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q26_session_window" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |   CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR
        |        THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | s AS (
        |  SELECT user_id, ts, sum(ns) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS start_sec,
        | CAST(count(*) AS BIGINT) AS n
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_sec""".stripMargin,

    "q23_grouping_sets" ->
      """SELECT event_type, user_id % 10 AS user_mod, CAST(count(*) AS BIGINT) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        |ORDER BY event_type NULLS FIRST, user_mod NULLS FIRST""".stripMargin,

    // The HLL sketch value is engine-specific, so q28 emits the exact
    // distinct count plus an accuracy flag the Spark side computes from
    // its sketch; the oracle asserts the flag is uniformly true.
    "q28_approx_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, true AS ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q29_interval_join" ->
      """SELECT e.event_id, CAST(count(o.o_custkey) AS BIGINT) AS n_orders
        |FROM events e LEFT JOIN orders o
        | ON e.user_id = o.o_custkey
        | AND o.o_orderdate BETWEEN e.ts - INTERVAL 7 DAY AND e.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q43/q44 derive deterministic noisy text per document (the fixture is
    // clean lowercase ASCII) so normalization/scrubbing are non-vacuous.
    "q43_text_normalize" ->
      """WITH n AS (SELECT doc_id,
        |  upper(substr(text, 1, 20))||'... (NOISE!!) "quoted"; '||text AS noisy
        |  FROM documents),
        | c AS (SELECT doc_id,
        |  trim(regexp_replace(
        |    translate(lower(noisy), '.,!?;:()[]{}"''-', '               '),
        |    ' +', ' ', 'g')) AS norm FROM n)
        |SELECT doc_id, substr(norm, 1, 80) AS norm_prefix,
        | CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens
        |FROM c ORDER BY doc_id""".stripMargin,

    "q44_pii_scrub" ->
      """WITH n AS (SELECT doc_id,
        |  text||' Contact: user'||CAST(doc_id AS VARCHAR)
        |    ||'@example.com or +1 (555) 010-'||lpad(CAST(doc_id AS VARCHAR), 4, '0')
        |    ||' now.' AS noisy
        |  FROM documents),
        | s AS (SELECT doc_id, noisy,
        |  regexp_replace(
        |    regexp_replace(noisy, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9](?:[()\- ]{0,3}[0-9]){8,14}', '<PHONE>', 'g') AS scrubbed FROM n)
        |SELECT doc_id, scrubbed,
        | CAST(len(regexp_split_to_array(noisy, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1 AS BIGINT) AS n_emails,
        | CAST(len(string_split(scrubbed, '<PHONE>')) - 1 AS BIGINT) AS n_phones
        |FROM s ORDER BY doc_id""".stripMargin,

    "q45_pivot" ->
      """SELECT user_id,
        | CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        | CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        | CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        | CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        | CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS "view"
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q27_asof_join" ->
      """SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
        |FROM events e
        |ASOF LEFT JOIN (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |                FROM orders GROUP BY 1,2) o
        |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin,

    "q30_token_freq" ->
      """SELECT w AS token, CAST(count(*) AS BIGINT) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q31_doc_stats" ->
      s"""SELECT doc_id,
         | CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         | CAST(list_sum(list_transform(string_split(text,' '), w -> 1 + length(w)//6)) AS BIGINT) AS n_subwords,
         | CAST($qualityPpmSql AS BIGINT) AS quality_ppm
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q32_lang_id" ->
      s"""WITH sc AS (SELECT doc_id,
         | $langHitsSql
         | FROM documents)
         |SELECT doc_id, $langCaseSql AS lang_guess
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q33_fingerprints" ->
      s"""SELECT doc_id, md5(text) AS fp,
         | CAST(list_min(list_transform($trigrams, s -> ('0x'||substr(md5('0:'||s),1,8))::BIGINT)) AS BIGINT) AS rolling_fp
         |FROM (SELECT doc_id, text, string_split(text,' ') AS l FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q34_dedup_exact" ->
      """SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
        | CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    // the engine's default document-frequency cap is inlined: shingle
    // buckets with more than DefaultShingleBucketCap member rows are
    // excluded from the intersection counts (the drop criterion itself
    // is value-gated, the q101 pattern)
    "q35_jaccard_pairs" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
         | sh AS (SELECT doc_id AS id, unnest($trigrams) AS sh FROM d),
         | hb AS (SELECT id, ('0x'||substr(md5('0:'||sh),1,8))::BIGINT AS h FROM sh),
         | keep AS (SELECT h FROM hb GROUP BY h
         |          HAVING count(*) > 1 AND count(*) <= ${graft.ext.Dedup.DefaultShingleBucketCap}),
         | sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
         | inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
         |           FROM hb a JOIN keep k ON a.h = k.h
         |           JOIN hb b ON a.h = b.h AND a.id < b.id GROUP BY 1,2)
         |SELECT id_a, id_b,
         | CAST((inter*1000000) // (sa.n + sb.n - inter) AS BIGINT) AS jaccard_ppm
         |FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
         |WHERE inter::DOUBLE/(sa.n + sb.n - inter) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "q36_minhash_pairs" ->
      s"""WITH $minhashCtes
         |SELECT id_a, id_b FROM px
         |ORDER BY 1,2""".stripMargin,

    "q46_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
         | edges AS (SELECT id_a AS src, id_b AS dst FROM px
         |           UNION ALL SELECT id_b, id_a FROM px),
         | reach(id, r) AS (
         |   SELECT doc_id, doc_id FROM documents
         |   UNION
         |   SELECT e.src, reach.r FROM reach JOIN edges e ON e.dst = reach.id)
         |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,

    "q37_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
         | c AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS cv FROM embeddings),
         | s AS (SELECT qid, vid, $cosExpr AS cos FROM q, c WHERE qid <> vid),
         | r AS (SELECT qid, vid, cos,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS BIGINT) AS "rank"
         |       FROM s)
         |SELECT qid, vid, round(cos, 6) AS cos, "rank" FROM r WHERE "rank" <= 10
         |ORDER BY qid, "rank"""".stripMargin,

    "q40_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | c AS (SELECT vec_id AS vid, v AS cv, $lshBucketSql AS bucket FROM e),
         | q0 AS (SELECT vec_id AS qid, v AS qv, $lshBucketSql AS qbucket FROM e WHERE vec_id < 5),
         | q AS (SELECT qid, qv, xor(qbucket, f.flip) AS bucket
         |       FROM q0, (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS flip) f),
         | s AS (SELECT qid, vid, $cosExpr AS cos FROM q JOIN c USING (bucket) WHERE qid <> vid),
         | r AS (SELECT qid, vid, cos,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS BIGINT) AS "rank"
         |       FROM s)
         |SELECT qid, vid, round(cos, 6) AS cos, "rank" FROM r WHERE "rank" <= 10
         |ORDER BY qid, "rank"""".stripMargin,

    "q41_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | hp AS (SELECT vec_id AS pid, v AS pv,
         |         ('0x'||substr(md5('9:'||CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS hsh FROM e),
         | p AS (SELECT pid, pv, cent_id FROM (
         |        SELECT pid, pv, CAST(row_number() OVER (ORDER BY hsh, pid) AS BIGINT) AS cent_id
         |        FROM hp) WHERE cent_id <= 32),
         | ac AS (SELECT vid, cv, cent_id FROM (
         |        SELECT e.vec_id AS vid, e.v AS cv, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $pivotDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p) WHERE cr = 1),
         | aq AS (SELECT qid, qv, cent_id FROM (
         |        SELECT e.vec_id AS qid, e.v AS qv, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $pivotDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p WHERE e.vec_id < 5) WHERE cr <= 8),
         | s AS (SELECT qid, vid, $cosExpr AS cos FROM aq JOIN ac USING (cent_id) WHERE qid <> vid),
         | r AS (SELECT qid, vid, cos,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS BIGINT) AS "rank"
         |       FROM s)
         |SELECT qid, vid, round(cos, 6) AS cos, "rank" FROM r WHERE "rank" <= 10
         |ORDER BY qid, "rank"""".stripMargin,

    // banded-LSH candidates (4 bands × 6 planes, seeds 42..45 — the
    // engine's hyperplane constants inlined per band), exact cosine
    // verify on the distinct same-bucket pairs: the oracle replays the
    // recall trade itself, not just the verify arithmetic
    "q38_embed_neardup" -> {
      val bandCtes = (0 until 4).map { b =>
        s"b$b AS (SELECT vec_id AS id, $b AS band, ${lshBucketSqlSeeded(42L + b)} AS bucket FROM e)"
      }.mkString(",\n ")
      val bandUnion = (0 until 4).map(b => s"SELECT * FROM b$b").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | $bandCtes,
         | bb AS ($bandUnion),
         | cand AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b
         |          FROM bb a JOIN bb c ON a.band = c.band AND a.bucket = c.bucket
         |            AND a.id < c.id),
         | s AS (SELECT id_a, id_b,
         |        list_sum(list_transform(list_zip(ea.v, eb.v), x -> x[1]*x[2])) /
         |        (sqrt(list_sum(list_transform(ea.v, x -> x*x))) * sqrt(list_sum(list_transform(eb.v, x -> x*x)))) AS cos
         |       FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b)
         |SELECT id_a, id_b, round(cos, 6) AS cos FROM s WHERE cos >= 0.3
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q39_simhash" ->
      """WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok FROM documents),
        | bits AS (SELECT doc_id, i,
        |   sum(CASE WHEN (('0x'||substr(md5('0:'||tok),1,8))::BIGINT >> i) % 2 = 1 THEN 1 ELSE -1 END) AS sgn
        |  FROM t CROSS JOIN (SELECT unnest(generate_series(0,31)) AS i) g GROUP BY 1,2)
        |SELECT doc_id, CAST(sum(CASE WHEN sgn > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY 1 ORDER BY 1""".stripMargin,

    "q47_multimodal_batched" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(h % 1280 + 1 AS BIGINT) AS width,
        | CAST(CAST(floor(h/1280) AS BIGINT) % 720 + 1 AS BIGINT) AS height,
        | CAST(h % 60000 AS BIGINT) AS duration_ms
        |FROM (SELECT doc_id, text, ('0x'||substr(md5('0:'||text),1,8))::BIGINT AS h FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q59_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, l[i] AS token
        |FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
        |      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
        |ORDER BY doc_id, pos""".stripMargin,

    "q57_percentiles" ->
      """WITH r AS (SELECT event_type, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        | max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
        | max(CASE WHEN rn = (n * 9 + 9) // 10 THEN value END) AS p90,
        | max(CASE WHEN rn = (n * 99 + 99) // 100 THEN value END) AS p99
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q58_stats" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        | (CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE)
        |   - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |     * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)) / (count(*) - 1) AS variance,
        | sqrt((CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE)
        |   - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |     * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)) / (count(*) - 1)) AS stddev
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q55_array_funcs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        | CAST(len(generate_series(1, l_linenumber)) AS BIGINT) AS arr_len,
        | CAST(generate_series(1, l_linenumber)[1] AS BIGINT) AS first_el,
        | list_contains(generate_series(1, l_linenumber), 3) AS has3,
        | array_to_string(list_transform(generate_series(1, l_linenumber), x -> x::VARCHAR), '-') AS arr_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q56_map_funcs" ->
      """SELECT event_id,
        | CAST(len(json_keys(props)) AS BIGINT) AS m_size,
        | json_keys(props)[1] AS first_key,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q53_window_suite" ->
      """SELECT user_id, event_id,
        | lag(event_id, 1) OVER w AS prev_id,
        | lead(event_id, 1) OVER w AS next_id,
        | CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY floor(value)) AS BIGINT) AS value_rank,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | first_value(event_id) OVER wf AS first_id,
        | last_value(event_id) OVER wf AS last_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |       wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,

    "q54_sql_alerts" ->
      s"$q01Inner\nORDER BY start_sec, user_id",

    "q49_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        | s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x)))/127.0 AS scale FROM e),
        | q AS (SELECT vec_id, v, scale,
        |        list_transform(v, x -> CAST(floor(x/scale) AS INTEGER)) AS codes FROM s)
        |SELECT vec_id, scale,
        | CAST(codes[1] AS BIGINT) AS c0, CAST(codes[2] AS BIGINT) AS c1,
        | CAST(codes[3] AS BIGINT) AS c2, CAST(codes[4] AS BIGINT) AS c3,
        | round(list_sum(list_transform(list_zip(v, list_transform(codes, c -> c*scale)),
        |         x -> (x[1]-x[2])*(x[1]-x[2])))/len(v), 9) AS mse
        |FROM q ORDER BY vec_id""".stripMargin,

    "q50_hash_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x'||substr(md5('1:'||doc_id),1,8))::BIGINT % 10000 < 1000
        |ORDER BY doc_id""".stripMargin,

    "q51_stratified_split" ->
      """WITH b AS (SELECT doc_id, lang,
        |  ('0x'||substr(md5('1:'||doc_id),1,8))::BIGINT % 10000 AS bk,
        |  ('0x'||substr(md5('2:'||doc_id),1,8))::BIGINT % 10000 AS sk FROM documents)
        |SELECT doc_id, lang,
        | CASE WHEN sk < 9000 THEN 'train' WHEN sk < 9500 THEN 'valid' ELSE 'test' END AS split
        |FROM b
        |WHERE bk < CASE WHEN lang = 'en' THEN 500 WHEN lang = 'zh' THEN 5000 ELSE 1000 END
        |ORDER BY doc_id""".stripMargin,

    "q52_tfidf" ->
      """WITH t AS (SELECT doc_id AS id, unnest(string_split(text,' ')) AS token FROM documents),
        | tf AS (SELECT id, token, count(*) AS tf FROM t GROUP BY 1,2),
        | dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        | n AS (SELECT count(*) AS n FROM documents)
        |SELECT id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        | round(tf * ln(n::DOUBLE/df), 6) AS tf_idf
        |FROM tf JOIN dfq USING (token), n
        |ORDER BY id, token""".stripMargin,

    "q48_scalar_funcs" ->
      """SELECT c_custkey,
        | upper(c_name) AS name_upper,
        | lower(c_mktsegment) AS seg_lower,
        | substr(c_name, 1, 8) AS name_prefix,
        | regexp_replace(c_name, '0', '#', 'g') AS name_masked,
        | CAST(length(c_name) AS BIGINT) AS name_len,
        | abs(c_acctbal) AS abs_bal,
        | CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
        | CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
        | sqrt(abs(c_acctbal)) AS sqrt_bal,
        | c_custkey % 97 AS mod_key
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q42_multimodal" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(h % 1280 + 1 AS BIGINT) AS width,
        | CAST(CAST(floor(h/1280) AS BIGINT) % 720 + 1 AS BIGINT) AS height,
        | CAST(h % 60000 AS BIGINT) AS duration_ms,
        | round(h/4294967296.0, 6) AS f0
        |FROM (SELECT doc_id, text, ('0x'||substr(md5('0:'||text),1,8))::BIGINT AS h FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q60_exists_in_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 3)
        |ORDER BY c_custkey""".stripMargin,

    "q61_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice,
        | (SELECT count(*) FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey) AS n_items,
        | (SELECT count(*) FROM lineitem) AS n_lines_total
        |FROM orders o WHERE o_totalprice > 450000
        |ORDER BY o_orderkey""".stripMargin,

    "q62_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin,

    "q63_string_suite" ->
      """SELECT c_custkey,
        | translate(c_name, '#0', '_O') AS name_tr,
        | reverse(c_name) AS name_rev,
        | lpad(CAST(c_custkey AS VARCHAR), 12, '*') AS key_pad,
        | repeat(substring(c_mktsegment, 1, 2), 3) AS seg_rep,
        | CAST(instr(c_name, '1') AS BIGINT) AS pos1,
        | CAST(levenshtein(c_name, 'Customer#000000000') AS BIGINT) AS lev,
        | concat_ws('|', c_mktsegment, c_name) AS seg_name,
        | CAST(ascii(c_mktsegment) AS BIGINT) AS seg_ascii,
        | trim(substring(c_name, 10, 9), '0') AS key_digits
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q64_repetition" ->
      """WITH t AS (SELECT doc_id, text, string_split(text,' ') AS l FROM documents),
        | m AS (SELECT doc_id,
        |   len(l) AS total, len(list_distinct(l)) AS uniq,
        |   list_transform(generate_series(1, len(l)-1), i -> l[i]||' '||l[i+1]) AS bi,
        |   length(text) AS nchars
        |  FROM t)
        |SELECT doc_id,
        | CAST(total AS BIGINT) AS n_tokens,
        | CAST(floor((total - uniq) * 1000000 / total) AS BIGINT) AS dup_word_ppm,
        | CAST(CASE WHEN len(bi) > 0
        |   THEN floor((len(bi) - len(list_distinct(bi))) * 1000000 / len(bi))
        |   ELSE 0 END AS BIGINT) AS dup_bigram_ppm,
        | CAST(floor((nchars - (total - 1)) * 100 / total) AS BIGINT) AS mean_word_len_c
        |FROM m ORDER BY doc_id""".stripMargin,

    "q65_url_domains" ->
      """WITH n AS (SELECT doc_id, text
        |  ||' see https://www.site.example'||CAST(doc_id % 7 AS VARCHAR)||'.com/p/'||CAST(doc_id AS VARCHAR)
        |  ||CASE WHEN doc_id % 3 = 0
        |     THEN ' and http://cdn.assets'||CAST(doc_id % 5 AS VARCHAR)||'.org/img_'||CAST(doc_id AS VARCHAR)||'.png'
        |     ELSE '' END AS noisy
        |  FROM documents),
        | u AS (SELECT doc_id,
        |   unnest(regexp_extract_all(noisy, 'https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?')) AS url FROM n),
        | d AS (SELECT doc_id, regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS host FROM u),
        | dom AS (SELECT doc_id, CASE WHEN len(string_split(host,'.')) <= 2 THEN host
        |   ELSE string_split(host,'.')[-2]||'.'||string_split(host,'.')[-1] END AS domain FROM d)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls, CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM dom GROUP BY 1 ORDER BY domain""".stripMargin,

    "q66_packing" ->
      """WITH t AS (SELECT doc_id, lang, len(string_split(text,' ')) AS n_tokens FROM documents),
        | b AS (SELECT lang, n_tokens,
        |   COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
        |  FROM t)
        |SELECT lang, CAST(floor(tok_before / 512) AS BIGINT) AS bin,
        | CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM b GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin,

    "q67_mixture_sample" ->
      """WITH w AS (SELECT doc_id, source,
        |   CASE source WHEN 'src0' THEN 2500 WHEN 'src1' THEN 1500 WHEN 'src2' THEN 300
        |    ELSE 1000 END AS wm,
        |   ('0x'||substr(md5('3:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10000 AS b
        |  FROM documents),
        | n AS (SELECT doc_id, source,
        |   wm // 1000 + CASE WHEN b < (wm % 1000) * 10 THEN 1 ELSE 0 END AS n FROM w)
        |SELECT doc_id, source, CAST(unnest(generate_series(1, n)) AS BIGINT) AS copy
        |FROM n WHERE n > 0
        |ORDER BY doc_id, copy""".stripMargin,

    "q68_contamination" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
         | sh AS (SELECT doc_id AS id, unnest(list_distinct(list_transform(
         |   generate_series(1, len(l)-4),
         |   i -> l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4]))) AS sh FROM d),
         | bench AS (SELECT DISTINCT sh FROM sh WHERE id % 20 = 0)
         |SELECT c.id AS doc_id, CAST(count(b.sh) AS BIGINT) AS n_hits
         |FROM (SELECT * FROM sh WHERE id % 20 != 0) c LEFT JOIN bench b ON c.sh = b.sh
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q69_range_frame" ->
      """WITH t AS (SELECT o_orderkey, o_custkey,
        |   CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ts_sec FROM orders)
        |SELECT o_orderkey, o_custkey, ts_sec,
        | CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY ts_sec
        |   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_week
        |FROM t ORDER BY o_orderkey""".stripMargin,

    "q70_gap_fill" ->
      """WITH c AS (SELECT user_id, CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS day_sec,
        |   count(*) AS n FROM events GROUP BY 1, 2),
        | s AS (SELECT user_id, min(day_sec) AS lo, max(day_sec) AS hi FROM c
        |   GROUP BY 1 HAVING max(day_sec) - min(day_sec) < CAST(100000 AS BIGINT) * 86400),
        | g AS (SELECT user_id, unnest(generate_series(lo, hi, 86400)) AS day_sec FROM s)
        |SELECT g.user_id AS user_id, g.day_sec AS day_sec,
        | CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        |FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.day_sec = c.day_sec
        |ORDER BY g.user_id, g.day_sec""".stripMargin,

    "q71_bm25" -> {
      // constants interpolated from the SAME Scala doubles the operator
      // uses (Double.toString round-trips, so DuckDB parses identical
      // values — including k1+1, which is NOT the double literal 2.2)
      val k1 = 1.2; val b = 0.75
      s"""WITH tk AS (SELECT doc_id AS id, string_split(text,' ') AS toks FROM documents),
         | dls AS (SELECT id, len(toks) AS dl FROM tk),
         | t AS (SELECT id, unnest(toks) AS token FROM tk),
         | tf AS (SELECT id, token, count(*) AS tf FROM t GROUP BY 1, 2),
         | df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         | st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dls)
         |SELECT tf.id AS id, tf.token AS token,
         | CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
         | round(
         |   ln(1.0 + (CAST(st.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
         |   * (tf.tf * ${k1 + 1.0})
         |   / (tf.tf + $k1 * (${1.0 - b} + $b * dls.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))), 6) AS bm25
         |FROM tf JOIN df USING (token) JOIN dls ON tf.id = dls.id CROSS JOIN st
         |ORDER BY tf.id, tf.token""".stripMargin
    },

    "q72_media_pipeline" ->
      """WITH m AS (SELECT doc_id, encode(text) AS payload,
        |    ('0x'||substr(md5('0:'||text),1,8))::BIGINT AS h FROM documents),
        | d AS (SELECT doc_id, hex(payload) AS hx, octet_length(payload) AS total,
        |    CAST(h % 1280 + 1 AS BIGINT) AS width,
        |    CAST(CAST(floor(h/1280) AS BIGINT) % 720 + 1 AS BIGINT) AS height
        |   FROM m),
        | e AS (SELECT *, CAST(greatest(floor((total - 8) / 2), 0) AS BIGINT) AS step FROM d)
        |SELECT doc_id, width, height,
        | CAST(floor(width * 224 / greatest(width, height)) AS BIGINT) AS rw,
        | CAST(floor(height * 224 / greatest(width, height)) AS BIGINT) AS rh,
        | substring(hx, 1, 16) AS s0,
        | substring(hx, CAST(step*2 + 1 AS BIGINT), 16) AS s1,
        | substring(hx, CAST(step*4 + 1 AS BIGINT), 16) AS s2
        |FROM e ORDER BY doc_id""".stripMargin,

    "q73_cdc_compact" ->
      """WITH r AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_usec, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, CAST(ts_usec AS BIGINT) AS ts_usec, value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // the oracle PARSES the same malformed payloads (json_valid +
    // json_extract) rather than recomputing the expected outcome — so a
    // Spark-side parse-behavior regression cannot cancel out
    "q74_corrupt_quarantine" ->
      """WITH r AS (SELECT doc_id,
        |   CASE WHEN doc_id % 7 = 0 THEN '{"a":'||CAST(doc_id AS VARCHAR)
        |    ELSE '{"a":'||CAST(doc_id AS VARCHAR)||',"b":"x"}' END AS raw
        |  FROM documents)
        |SELECT doc_id, json_valid(raw) AS ok,
        | CASE WHEN json_valid(raw)
        |   THEN CAST(json_extract_string(raw, '$.a') AS BIGINT) END AS a,
        | CASE WHEN json_valid(raw) THEN json_extract_string(raw, '$.b') END AS b
        |FROM r ORDER BY doc_id""".stripMargin,

    "q75_rollup_cascade" ->
      """WITH h AS (SELECT user_id, CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS hour_sec,
        |    count(*) AS n, sum(CAST(floor(value) AS BIGINT)) AS sum_v
        |   FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(floor(hour_sec/86400)*86400 AS BIGINT) AS day_sec,
        | CAST(count(*) AS BIGINT) AS n_hours, CAST(sum(n) AS BIGINT) AS n_events,
        | CAST(sum(sum_v) AS BIGINT) AS sum_v
        |FROM h GROUP BY 1, 2 ORDER BY user_id, day_sec""".stripMargin,

    // like q28: the sketch value is engine-specific, so the oracle emits
    // the exact rank-selected median and asserts the accuracy flag
    "q76_approx_percentile" ->
      """WITH e AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events),
        | r AS (SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt FROM e)
        |SELECT event_type, v AS exact_p50, true AS ok
        |FROM r WHERE rn = (cnt + 1) // 2
        |ORDER BY event_type""".stripMargin,

    "q77_inverted_index" ->
      """WITH t AS (SELECT doc_id AS id, unnest(list_distinct(string_split(text,' '))) AS token
        |   FROM documents),
        | ii AS (SELECT token, count(*) AS df,
        |    string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS postings
        |   FROM t GROUP BY 1),
        | n AS (SELECT count(*) AS n FROM documents)
        |SELECT token, CAST(df AS BIGINT) AS df, postings
        |FROM ii, n WHERE df * 20 >= n ORDER BY token""".stripMargin,

    "q78_boolean_search" ->
      """WITH t AS (SELECT doc_id AS id, unnest(list_distinct(string_split(text,' '))) AS token
        |   FROM documents)
        |SELECT id AS doc_id FROM t
        |WHERE token IN ('batch', 'scan', 'join')
        |GROUP BY 1 HAVING count(*) = 3
        |ORDER BY doc_id""".stripMargin,

    "q79_rank_stats" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        | percent_rank() OVER (PARTITION BY c_mktsegment
        |   ORDER BY c_acctbal, c_custkey) AS pr,
        | cume_dist() OVER (PARTITION BY c_mktsegment
        |   ORDER BY c_acctbal, c_custkey) AS cd
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q80_date_arithmetic" ->
      """SELECT o_orderkey,
        | CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ts_sec,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR AS due_date,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS BIGINT)
        |   AS days_to_2025,
        | CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_start_sec,
        | last_day(CAST(o_orderdate AS DATE))::VARCHAR AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q81_nested_types" ->
      """WITH x AS (SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS total,
        |   unnest([struct_pack(seq := 1, part := o_totalprice*0.5),
        |           struct_pack(seq := 2, part := o_totalprice*0.5)]) AS h
        |  FROM orders)
        |SELECT o_orderkey, status, total,
        | CAST(h.seq AS BIGINT) AS seq, h.part AS part
        |FROM x ORDER BY o_orderkey, seq""".stripMargin,

    "q82_conditional_aggs" ->
      """SELECT o_orderpriority,
        | CAST(count(*) FILTER (o_totalprice > 200000) AS BIGINT) AS n_big,
        | bool_or(o_totalprice > 500000) AS any_huge,
        | bool_and(o_totalprice > 1000) AS all_over_1k,
        | CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q83_histogram" ->
      """WITH h AS (SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
        |    count(*) AS n FROM orders GROUP BY 1)
        |SELECT bin, CAST(bin * 50000 AS BIGINT) AS bin_lo, CAST(n AS BIGINT) AS n,
        | CAST(floor(n * 1000000 / sum(n) OVER ()) AS BIGINT) AS share_ppm
        |FROM h ORDER BY bin""".stripMargin,

    // product sums as BIGINT in 1e-4 units: their unscaled decimals pass
    // 2^53, where DECIMAL→DOUBLE casts differ by 1 ulp across engines
    "q84_corr_components" ->
      """WITH a AS (
        |  SELECT l_returnflag, count(*) AS n,
        |   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
        |   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_y,
        |   CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) * 10000 AS BIGINT) AS sum_xy_e4,
        |   CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) * 10000 AS BIGINT) AS sum_x2_e4,
        |   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) * 10000 AS BIGINT) AS sum_y2_e4
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n, sum_x, sum_y,
        | sum_xy_e4, sum_x2_e4, sum_y2_e4,
        | round((n::DOUBLE * (sum_xy_e4::DOUBLE * 1e-4) - sum_x * sum_y) /
        |   (sqrt(n::DOUBLE * (sum_x2_e4::DOUBLE * 1e-4) - sum_x * sum_x)
        |    * sqrt(n::DOUBLE * (sum_y2_e4::DOUBLE * 1e-4) - sum_y * sum_y)), 6) AS corr6
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "q85_html_strip" ->
      """WITH n AS (SELECT doc_id,
        |  '<div id="d' || CAST(doc_id AS VARCHAR) || '"><p>Intro &amp; stuff</p> '
        |   || text || ' <br/>tail &lt;x&gt; &#39;q&#39;</div>' AS noisy
        |  FROM documents),
        | c AS (SELECT doc_id, noisy,
        |  trim(regexp_replace(
        |   replace(replace(replace(replace(replace(
        |    regexp_replace(noisy, '<[^>]*>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
        |   ' +', ' ', 'g')) AS clean
        |  FROM n)
        |SELECT doc_id, substr(clean, 1, 60) AS clean_prefix,
        | CAST(length(clean) AS BIGINT) AS n_chars_clean,
        | CAST(len(string_split_regex(noisy, '<[^>]*>')) - 1 AS BIGINT) AS n_tags
        |FROM c ORDER BY doc_id""".stripMargin,

    "q86_quality_funnel" ->
      """WITH m AS (SELECT doc_id, n_chars, text, string_split(text,' ') AS l FROM documents),
        | s AS (SELECT CASE
        |    WHEN NOT (n_chars >= 200) THEN 0
        |    WHEN NOT (len(l) BETWEEN 30 AND 2000) THEN 1
        |    WHEN NOT (floor((len(l) - len(list_distinct(l))) * 1000000 / len(l)) < 300000) THEN 2
        |    WHEN NOT (floor((length(text) - (len(l) - 1)) * 100 / len(l)) BETWEEN 300 AND 1000) THEN 3
        |    ELSE 4 END AS d
        |   FROM m),
        | a AS (SELECT count(*) FILTER (d >= 1) AS p0, count(*) FILTER (d >= 2) AS p1,
        |    count(*) FILTER (d >= 3) AS p2, count(*) FILTER (d >= 4) AS p3 FROM s)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS stage, 'min_chars' AS stage_name, CAST(p0 AS BIGINT) AS n_pass FROM a
        | UNION ALL SELECT 2, 'token_range', CAST(p1 AS BIGINT) FROM a
        | UNION ALL SELECT 3, 'low_repetition', CAST(p2 AS BIGINT) FROM a
        | UNION ALL SELECT 4, 'word_len', CAST(p3 AS BIGINT) FROM a)
        |ORDER BY stage""".stripMargin,

    // the bloom pre-filter is a pure optimization: the exact semi join it
    // feeds makes the result equal the plain EXISTS
    "q87_bloom_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q88_zipf_coverage" ->
      """WITH tok AS (SELECT unnest(string_split(text,' ')) AS token FROM documents),
        | c AS (SELECT token, count(*) AS freq FROM tok GROUP BY 1),
        | tot AS (SELECT sum(len(string_split(text,' '))) AS total FROM documents),
        | top AS (SELECT token, freq FROM c ORDER BY freq DESC, token LIMIT 100),
        | r AS (SELECT token, freq,
        |    row_number() OVER (ORDER BY freq DESC, token) AS rank,
        |    sum(freq) OVER (ORDER BY freq DESC, token
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |   FROM top)
        |SELECT CAST(rank AS BIGINT) AS rank, token, CAST(freq AS BIGINT) AS freq,
        | CAST(floor(cum * 1000000 / total) AS BIGINT) AS cum_ppm
        |FROM r, tot ORDER BY rank""".stripMargin,

    "q89_bigram_lm" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        | bi AS (SELECT unnest(list_transform(generate_series(1, len(l)-1),
        |    i -> l[i] || ' ' || l[i+1])) AS b FROM d),
        | c AS (SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
        |    count(*) AS n FROM bi GROUP BY 1, 2)
        |SELECT w1, w2, CAST(n AS BIGINT) AS n,
        | CAST(floor(n * 1000000 / sum(n) OVER (PARTITION BY w1)) AS BIGINT) AS cond_ppm
        |FROM c ORDER BY n DESC, w1, w2 LIMIT 200""".stripMargin,

    "q90_full_outer" ->
      """WITH s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier
        |   WHERE s_acctbal > 5000 GROUP BY 1),
        | c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer
        |   WHERE c_acctbal > 9800 GROUP BY 1)
        |SELECT CAST(coalesce(s_nationkey, c_nationkey) AS BIGINT) AS nationkey,
        | CAST(n_supp AS BIGINT) AS n_supp, CAST(n_cust AS BIGINT) AS n_cust
        |FROM s FULL OUTER JOIN c ON s_nationkey = c_nationkey
        |ORDER BY nationkey""".stripMargin,

    // same gaps-and-islands CTE chain as q26 (which oracles the built-in
    // session_window) extended with session end — q91 is the
    // window-function twin computed by the ENGINE, so the two queries
    // pin builtin ≡ formulation across both engines
    "q91_sessionize_batch" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |   CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR
        |        THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | s AS (
        |  SELECT user_id, ts, sum(ns) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS start_sec,
        | CAST(floor(epoch(max(ts))) AS BIGINT) AS end_sec,
        | CAST(count(*) AS BIGINT) AS n
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_sec""".stripMargin,

    "q92_lexical_diversity" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
        | c AS (SELECT doc_id, token, count(*) AS c FROM t GROUP BY 1, 2),
        | a AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
        |    count(*) FILTER (c = 1) AS n_hapax FROM c GROUP BY 1)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(n_distinct AS BIGINT) AS n_distinct, CAST(n_hapax AS BIGINT) AS n_hapax,
        | CAST(floor(n_distinct * 1000000 / n_tokens) AS BIGINT) AS ttr_ppm,
        | CAST(floor(n_hapax * 1000000 / n_tokens) AS BIGINT) AS hapax_ppm
        |FROM a ORDER BY doc_id""".stripMargin,

    "q93_lsh_band_stats" ->
      s"""WITH $minhashCtes,
         | k AS (SELECT band, bkey, count(*) AS k FROM b GROUP BY 1, 2)
         |SELECT CAST(band AS BIGINT) AS band, CAST(count(*) AS BIGINT) AS n_buckets,
         | CAST(count(*) FILTER (k > 1) AS BIGINT) AS n_colliding,
         | CAST(sum(k * (k - 1) // 2) AS BIGINT) AS n_candidate_pairs,
         | CAST(count(*) FILTER (k > 3) AS BIGINT) AS n_dropped_buckets,
         | CAST(coalesce(sum(k * (k - 1) // 2) FILTER (k > 3), 0) AS BIGINT) AS n_dropped_pairs
         |FROM k GROUP BY 1 ORDER BY band""".stripMargin,

    // salting only changes the shuffle layout; the merged result must
    // equal the plain aggregate, which is what this oracle is
    "q94_salted_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q95_topk_aggregator" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q96_grouping_id" ->
      """SELECT event_type, user_id % 10 AS user_mod,
        | CAST(GROUPING(event_type) AS BIGINT) AS g_type,
        | CAST(GROUPING(user_id % 10) AS BIGINT) AS g_mod,
        | CAST(count(*) AS BIGINT) AS n
        |FROM events
        |GROUP BY ROLLUP (event_type, user_id % 10)
        |ORDER BY g_type, g_mod, event_type NULLS FIRST, user_mod NULLS FIRST""".stripMargin,

    // the grid formulation IS the round trip: every (user, type) cell,
    // zeros included
    "q97_unpivot" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        | t AS (SELECT unnest(['click', 'purchase', 'view']) AS event_type),
        | c AS (SELECT user_id, event_type, count(*) AS n FROM events
        |   WHERE event_type IN ('click', 'purchase', 'view') GROUP BY 1, 2)
        |SELECT u.user_id, t.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |FROM u CROSS JOIN t
        |LEFT JOIN c ON u.user_id = c.user_id AND t.event_type = c.event_type
        |ORDER BY u.user_id, t.event_type""".stripMargin,

    "q98_recursive_cte" ->
      """WITH RECURSIVE chain(k, cur, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT k, cur // 10, depth + 1 FROM chain WHERE cur > 0)
        |SELECT k AS c_custkey, CAST(max(depth) AS BIGINT) AS chain_len
        |FROM chain GROUP BY k ORDER BY c_custkey""".stripMargin,

    "q99_array_hof" ->
      """WITH x AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |   generate_series(1, CAST(l_linenumber AS BIGINT) * 2) AS arr
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        | CAST(len(list_filter(arr, y -> y % 2 = 0)) AS BIGINT) AS n_even,
        | len(list_filter(arr, y -> y % 3 = 0)) > 0 AS any_div3,
        | len(list_filter(arr, y -> NOT (y > 0))) = 0 AS all_pos,
        | CAST(list_sum(arr) AS BIGINT) AS sum_fold,
        | CAST(list_sum(list_transform(list_zip(arr, list_reverse(arr)),
        |   p -> p[1] * p[2])) AS BIGINT) AS dot_rev
        |FROM x ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q100_dedup_keep" ->
      """SELECT CAST(d.doc_id AS BIGINT) AS doc_id, md5(d.text) AS fp
        |FROM documents d
        |JOIN (SELECT md5(text) AS fp, min(doc_id) AS keep_id
        |      FROM documents GROUP BY 1) k
        |  ON md5(d.text) = k.fp AND d.doc_id = k.keep_id
        |ORDER BY doc_id""".stripMargin,

    "q101_minhash_pairs_capped" ->
      s"""WITH $minhashCtes,
         | k AS (SELECT band, bkey, count(*) AS k FROM b GROUP BY 1, 2),
         | keep AS (SELECT band, bkey FROM k WHERE k > 1 AND k <= 3)
         |SELECT DISTINCT a.id AS id_a, c.id AS id_b
         |FROM b a
         |JOIN keep USING (band, bkey)
         |JOIN b c ON a.band = c.band AND a.bkey = c.bkey AND a.id < c.id
         |ORDER BY 1, 2""".stripMargin,

    // 64-bit SimHash: seed-0 md5 half for bits 0-31, seed-1 half for
    // 32-63; the HUGEINT power list + explicit two's-complement wrap
    // sidestep DuckDB's 1<<63 overflow error while matching Java's
    // signed-long bit layout exactly
    "q102_simhash64" -> {
      val powers = (0 until 64).map(i => BigInt(1) << i).mkString("[", ",", "]")
      s"""WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok FROM documents),
         | bits AS (SELECT doc_id, i,
         |   sum(CASE WHEN ((CASE WHEN i < 32 THEN ('0x'||substr(md5('0:'||tok),1,8))::BIGINT
         |                   ELSE ('0x'||substr(md5('1:'||tok),1,8))::BIGINT END)
         |        >> (i % 32)) % 2 = 1 THEN 1 ELSE -1 END) AS sgn
         |  FROM t CROSS JOIN (SELECT unnest(generate_series(0,63)) AS i) g GROUP BY 1,2),
         | v AS (SELECT doc_id, sum(CASE WHEN sgn > 0 THEN ($powers)[i+1] ELSE 0 END) AS v
         |       FROM bits GROUP BY 1)
         |SELECT doc_id, CAST(CASE WHEN v >= 9223372036854775808
         |  THEN v - 18446744073709551616 ELSE v END AS BIGINT) AS simhash64
         |FROM v ORDER BY 1""".stripMargin
    },

    // seeded-hash ordering + row_number, same md5Hash32 primitive as
    // q50's sampling bucket; ties break on doc_id like the operator
    "q103_cap_per_key" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY ('0x'||substr(md5('4:'||doc_id),1,8))::BIGINT, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 10 ORDER BY doc_id""".stripMargin,

    // same md5-of-sorted-tokens key both sides; min-id keep rule matches
    // q100's byte-exact formulation. IS NOT DISTINCT FROM mirrors the
    // operator's null-safe key join: NULL-text rows form ONE group and
    // keep their min id (md5 of NULL is NULL — a plain '=' would drop
    // every NULL-text row the Spark side keeps)
    "q104_dedup_bow" ->
      """SELECT d.doc_id, d.source FROM documents d
        |JOIN (SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS k,
        |             min(doc_id) AS keep
        |      FROM documents GROUP BY 1) g
        |  ON md5(array_to_string(list_sort(string_split(d.text, ' ')), ' '))
        |       IS NOT DISTINCT FROM g.k
        | AND d.doc_id = g.keep
        |ORDER BY doc_id""".stripMargin,

    // positional 5-gram join vs the q68 benchmark split, then the same
    // gaps-and-islands merge the operator runs (break iff pos >= prev+5)
    "q105_contaminated_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        | bsh AS (SELECT DISTINCT unnest(list_transform(generate_series(1, len(l)-4),
        |     i -> l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4])) AS sh
        |   FROM d WHERE doc_id % 20 = 0),
        | csh AS (SELECT doc_id AS id, unnest(list_transform(generate_series(1, len(l)-4),
        |     i -> struct_pack(pos := i-1,
        |       sh := l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4]))) AS e
        |   FROM d WHERE doc_id % 20 != 0),
        | hits AS (SELECT id, (e).pos AS pos FROM csh JOIN bsh ON (e).sh = bsh.sh),
        | m AS (SELECT id, pos, CASE WHEN lag(pos) OVER w IS NULL
        |     OR pos >= lag(pos) OVER w + 5 THEN 1 ELSE 0 END AS brk
        |   FROM hits WINDOW w AS (PARTITION BY id ORDER BY pos)),
        | isl AS (SELECT id, pos,
        |     sum(brk) OVER (PARTITION BY id ORDER BY pos) AS island FROM m)
        |SELECT id AS doc_id, CAST(min(pos) AS BIGINT) AS start_tok,
        |  CAST(max(pos) + 5 AS BIGINT) AS end_tok,
        |  CAST(max(pos) + 5 - min(pos) AS BIGINT) AS n_tokens
        |FROM isl GROUP BY id, island ORDER BY doc_id, start_tok""".stripMargin,

    // OR-chain lambda instead of IN (DuckDB 1.0 lambda parser); floor-div
    // ppm matches the operator's integer arithmetic
    "q106_blocklist" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        | c AS (SELECT doc_id, len(list_filter(l,
        |     x -> x = 'spark' OR x = 'window' OR x = 'batch')) AS hits,
        |   len(l) AS total FROM t)
        |SELECT doc_id, CAST(hits AS BIGINT) AS n_blocked,
        |  CAST(CASE WHEN total > 0 THEN hits * 1000000 // total ELSE 0 END AS BIGINT)
        |    AS blocked_ppm
        |FROM c ORDER BY doc_id""".stripMargin,

    // Mirrors graft.ext.Bmff.synthetic's closed-form container layout
    // (n samples, per-sample sizes, every-3rd sync samples, two chunks,
    // co64 base shift on odd ids) — recomputed WITHOUT parsing bytes, so
    // a sample-table-walk bug on the Spark side cannot cancel out
    "q107_keyframe_offsets" ->
      """WITH d AS (SELECT doc_id, 6 + doc_id % 5 AS n,
        |    4096 + doc_id % 100
        |      + CASE WHEN doc_id % 2 = 1 THEN 4294967296 ELSE 0 END AS base1
        |   FROM documents),
        | s AS (SELECT doc_id, n, base1, unnest(generate_series(1, n)) AS k FROM d),
        | sz AS (SELECT doc_id, n, base1, k,
        |    50 + (doc_id * 7 + k * 13) % 40 AS sz,
        |    CASE WHEN k <= n // 2 THEN 1 ELSE 2 END AS chunk FROM s),
        | o AS (SELECT doc_id, k,
        |    CASE WHEN chunk = 1 THEN base1 ELSE base1 + 65536 END
        |     + COALESCE(sum(sz) OVER (PARTITION BY doc_id, chunk ORDER BY k
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS kf_offset
        |   FROM sz)
        |SELECT doc_id, CAST((k - 1) // 3 + 1 AS BIGINT) AS kf_idx,
        |  CAST(kf_offset AS BIGINT) AS kf_offset
        |FROM o WHERE (k - 1) % 3 = 0 ORDER BY doc_id, kf_idx""".stripMargin,

    // first-failing-stage precedence mirrors the curate pipeline:
    // exact_dup (not the min id of the byte-identical group) -> lang
    // (q32's argmax) -> quality (q31's integer formula < 600000) ->
    // repetition (dup-word ppm > 600000) -> kept
    "q108_curation_audit" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 17 = 0),
         | k AS (SELECT doc_id, text,
         |    min(doc_id) OVER (PARTITION BY text) AS keep_id FROM u),
         | sc AS (SELECT doc_id, keep_id, text,
         | $langHitsSql
         |  FROM k),
         | v AS (SELECT doc_id, keep_id,
         |   $langCaseSql AS lang_guess,
         |   $qualityPpmSql AS quality_ppm,
         |   ((len(string_split(text,' ')) - len(list_distinct(string_split(text,' '))))
         |     * 1000000) // len(string_split(text,' ')) AS dup_word_ppm
         |  FROM sc)
         |SELECT doc_id, CASE
         |  WHEN doc_id <> keep_id THEN 'exact_dup'
         |  WHEN lang_guess <> 'en' THEN 'lang'
         |  WHEN quality_ppm < 600000 THEN 'quality'
         |  WHEN dup_word_ppm > 600000 THEN 'repetition'
         |  ELSE 'kept' END AS verdict
         |FROM v ORDER BY doc_id""".stripMargin,

    // the oracle rebuilds the SAME deterministic old/new snapshots and
    // compares text directly (the Spark side compares fingerprints —
    // identical verdicts by construction)
    "q109_snapshot_diff" ->
      """WITH oldt AS (SELECT doc_id, text FROM documents),
        | newt AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' revised' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'synthetic new doc ' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 11 = 0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM oldt o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // q46's recursive-CTE clusters + q31's integer quality formula;
    // winner = highest quality per cluster, ties to the lowest id
    "q110_keep_best" -> {
      s"""WITH RECURSIVE $minhashCtes,
         | edges AS (SELECT id_a AS src, id_b AS dst FROM px
         |           UNION ALL SELECT id_b, id_a FROM px),
         | reach(id, r) AS (
         |   SELECT doc_id, doc_id FROM documents
         |   UNION
         |   SELECT e.src, reach.r FROM reach JOIN edges e ON e.dst = reach.id),
         | lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
         | q AS (SELECT doc_id,
         |   CAST($qualityPpmSql AS BIGINT) AS quality_ppm
         |  FROM documents),
         | w AS (SELECT l.doc_id, q.quality_ppm,
         |   row_number() OVER (PARTITION BY l.cluster_id
         |     ORDER BY q.quality_ppm DESC, l.doc_id) AS rn
         |  FROM lab l JOIN q USING (doc_id))
         |SELECT doc_id, quality_ppm FROM w WHERE rn = 1 ORDER BY doc_id""".stripMargin
    },

    // windows: 1 + ceil(max(n-64,0)/48) (stride 48 = size 64 - overlap
    // 16), integer ceil via (x+47)//48; DuckDB 1-based inclusive list
    // slices truncate at the end exactly like Spark's slice(toks, s, 64)
    "q111_chunk_tokens" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        | w AS (SELECT doc_id, l,
        |    unnest(generate_series(0, (greatest(len(l) - 64, 0) + 47) // 48)) AS i
        |   FROM d),
        | c AS (SELECT doc_id, i, l[(i*48+1):(i*48+64)] AS cl FROM w)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(len(cl) AS BIGINT) AS n_chunk_tokens,
        |  md5(array_to_string(cl, ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // q41's pivot machinery at nlist=8/nprobe=1, then q38's within-cluster
    // cosine — SemDeDup's cluster-then-compare, oracle-exact
    "q112_semantic_pairs" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | hp AS (SELECT vec_id AS pid, v AS pv,
         |         ('0x'||substr(md5('9:'||CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS hsh FROM e),
         | p AS (SELECT pid, pv, cent_id FROM (
         |        SELECT pid, pv, CAST(row_number() OVER (ORDER BY hsh, pid) AS BIGINT) AS cent_id
         |        FROM hp) WHERE cent_id <= 8),
         | ac AS (SELECT vid, cv, cent_id FROM (
         |        SELECT e.vec_id AS vid, e.v AS cv, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $pivotDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p) WHERE cr = 1),
         | s AS (SELECT a.vid AS id_a, b.vid AS id_b,
         |        list_sum(list_transform(list_zip(a.cv, b.cv), x -> x[1]*x[2])) /
         |        (sqrt(list_sum(list_transform(a.cv, x -> x*x))) *
         |         sqrt(list_sum(list_transform(b.cv, x -> x*x)))) AS cos
         |       FROM ac a JOIN ac b ON a.cent_id = b.cent_id AND a.vid < b.vid)
         |SELECT id_a, id_b, round(cos, 6) AS cos FROM s WHERE cos >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    // isqrt temperature weights (float sqrt + two-sided correction),
    // HUGEINT floor division twin of the operator's DECIMAL(38,0) DIV,
    // then q67's hash-driven copy generator
    "q113_temperature_sample" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1),
        | sq AS (SELECT lang, c, CASE WHEN f*f > c THEN f-1
        |          WHEN (f+1)*(f+1) <= c THEN f+1 ELSE f END AS s
        |        FROM (SELECT lang, c, CAST(floor(sqrt(c)) AS BIGINT) AS f FROM c)),
        | t AS (SELECT lang, c, s, sum(c) OVER () AS total, sum(s) OVER () AS sum_s FROM sq),
        | w AS (SELECT lang,
        |        CAST((1000::HUGEINT * s * total) // (c::HUGEINT * sum_s) AS BIGINT) AS weight_milli
        |       FROM t),
        | d AS (SELECT doc_id, d.lang, weight_milli,
        |        ('0x'||substr(md5('3:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10000 AS b
        |       FROM documents d JOIN w ON d.lang IS NOT DISTINCT FROM w.lang),
        | n AS (SELECT doc_id, lang, weight_milli,
        |        weight_milli // 1000
        |         + CASE WHEN b < (weight_milli % 1000) * 10 THEN 1 ELSE 0 END AS n FROM d)
        |SELECT doc_id, lang, weight_milli,
        |  CAST(unnest(generate_series(1, n)) AS BIGINT) AS copy
        |FROM n WHERE n > 0 ORDER BY doc_id, copy""".stripMargin,

    // single global-window greedy formulation — the operator's two-phase
    // histogram+boundary decomposition must reproduce it row-for-row
    "q114_token_budget" ->
      s"""WITH q AS (SELECT doc_id,
         |    CAST($qualityPpmSql AS BIGINT) AS quality_ppm,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         |    ('0x'||substr(md5('5:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT AS h
         |   FROM documents),
         | c AS (SELECT doc_id, quality_ppm, n_tokens,
         |    COALESCE(sum(n_tokens) OVER (ORDER BY quality_ppm DESC, h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl FROM q)
         |SELECT doc_id, quality_ppm, n_tokens FROM c WHERE excl < 6000
         |ORDER BY doc_id""".stripMargin,

    // FastSS deletion-neighborhood signatures (full md5 + one per
    // delete-one-token variant) recomputed via list slicing, then the
    // exact levenshtein verify — candidate recall and the filter both
    // mirrored bit for bit
    "q118_edit_dist_pairs" ->
      """WITH d AS (SELECT doc_id AS id, text FROM documents WHERE text IS NOT NULL),
        | t AS (SELECT id, text, string_split(text,' ') AS l FROM d),
        | s AS (SELECT id, unnest(list_distinct(list_concat([md5(text)],
        |     list_transform(generate_series(1, len(l)), i ->
        |       md5(array_to_string(list_concat(l[1:i-1], l[i+1:len(l)]), ' '))))))
        |     AS sig FROM t),
        | px AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b
        |   FROM s a JOIN s c ON a.sig = c.sig AND a.id < c.id),
        | v AS (SELECT id_a, id_b,
        |     CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist
        |   FROM px JOIN d da ON px.id_a = da.id JOIN d db ON px.id_b = db.id)
        |SELECT id_a, id_b, dist FROM v WHERE dist <= 10
        |ORDER BY id_a, id_b""".stripMargin,

    // both q89-style integer bigram models (corpus + target split), the
    // offset-shifted mean diff and clamp, then the shared copy generator.
    // sum() over BIGINT is HUGEINT in DuckDB — arithmetic stays exact
    "q117_importance_sample" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        | cb AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(l)-1),
        |     i -> struct_pack(w1 := l[i], w2 := l[i+1]))) AS e
        |   FROM d WHERE doc_id % 10 != 0),
        | cbi AS (SELECT doc_id, (e).w1 AS w1, (e).w2 AS w2 FROM cb),
        | cm0 AS (SELECT w1, w2, count(*) AS n FROM cbi GROUP BY 1, 2),
        | cm AS (SELECT w1, w2,
        |     CAST(floor(n * 1000000 / sum(n) OVER (PARTITION BY w1)) AS BIGINT) AS ppm_c
        |   FROM cm0),
        | tb AS (SELECT unnest(list_transform(generate_series(1, len(l)-1),
        |     i -> struct_pack(w1 := l[i], w2 := l[i+1]))) AS e
        |   FROM d WHERE doc_id % 10 = 0),
        | tm0 AS (SELECT (e).w1 AS w1, (e).w2 AS w2, count(*) AS n FROM tb GROUP BY 1, 2),
        | tm AS (SELECT w1, w2,
        |     CAST(floor(n * 1000000 / sum(n) OVER (PARTITION BY w1)) AS BIGINT) AS ppm_t
        |   FROM tm0),
        | sc AS (SELECT doc_id, count(*) AS n,
        |     sum(COALESCE(ppm_t, 0) - ppm_c) AS s
        |   FROM cbi JOIN cm USING (w1, w2) LEFT JOIN tm USING (w1, w2)
        |   GROUP BY 1),
        | wm AS (SELECT doc_id,
        |     least(5000, greatest(200,
        |       1000 + ((((s + 1000000*n) // n - 1000000) + 1000000) // 100 - 10000)))
        |     AS weight_milli
        |   FROM sc),
        | f AS (SELECT c.doc_id, COALESCE(weight_milli, 1000) AS weight_milli,
        |     ('0x'||substr(md5('3:'||CAST(c.doc_id AS VARCHAR)),1,8))::BIGINT % 10000 AS b
        |   FROM (SELECT doc_id FROM d WHERE doc_id % 10 != 0) c LEFT JOIN wm USING (doc_id)),
        | nn AS (SELECT doc_id, weight_milli,
        |     CAST(weight_milli // 1000
        |      + CASE WHEN b < (weight_milli % 1000) * 10 THEN 1 ELSE 0 END AS BIGINT) AS n
        |   FROM f)
        |SELECT doc_id, CAST(weight_milli AS BIGINT) AS weight_milli,
        |  CAST(unnest(generate_series(1, n)) AS BIGINT) AS copy
        |FROM nn WHERE n > 0 ORDER BY doc_id, copy""".stripMargin,

    // q114's greedy, windowed per language with a CASE budget table
    "q116_budget_per_lang" ->
      s"""WITH q AS (SELECT doc_id, lang,
         |    CAST($qualityPpmSql AS BIGINT) AS quality_ppm,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         |    ('0x'||substr(md5('5:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT AS h
         |   FROM documents),
         | c AS (SELECT doc_id, lang, quality_ppm, n_tokens,
         |    COALESCE(sum(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY quality_ppm DESC, h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl FROM q)
         |SELECT doc_id, lang, quality_ppm, n_tokens FROM c
         |WHERE excl < CASE lang WHEN 'en' THEN 2000 ELSE 1000 END
         |ORDER BY doc_id""".stripMargin,

    // integer floor-division mean per source (sum // count), null-safe
    // join back — the reputation gate's verdict rows
    "q115_source_reputation" ->
      s"""WITH q AS (SELECT doc_id, source,
         |    CAST($qualityPpmSql AS BIGINT) AS quality_ppm FROM documents),
         | r AS (SELECT source AS src, CAST(sum(quality_ppm) // count(*) AS BIGINT)
         |        AS src_quality_ppm FROM q GROUP BY 1)
         |SELECT doc_id, source, quality_ppm, src_quality_ppm,
         |  src_quality_ppm >= 650000 AS kept
         |FROM q JOIN r ON q.source IS NOT DISTINCT FROM r.src
         |ORDER BY doc_id""".stripMargin,

    // gram doc-frequency -> covered-index union -> token-level scrub,
    // all recomputed from the raw text; fully-scrubbed docs COALESCE to
    // '' (Spark's concat_ws over an empty kept-token array)
    "q119_boilerplate_scrub" ->
      """WITH d AS (SELECT doc_id, text, string_split(text,' ') AS l FROM documents),
        | g AS (SELECT doc_id AS id, unnest(list_transform(generate_series(1, len(l)-7),
        |     i -> struct_pack(pos := i-1,
        |       sh := list_aggregate(l[i:i+7], 'string_agg', ' ')))) AS e
        |   FROM d),
        | df AS (SELECT (e).sh AS sh FROM g GROUP BY 1
        |   HAVING count(distinct id) >= 2),
        | hits AS (SELECT id, (e).pos AS pos FROM g JOIN df ON (e).sh = df.sh),
        | cov AS (SELECT DISTINCT id, unnest(generate_series(pos, pos+7)) AS ti
        |   FROM hits),
        | cl AS (SELECT id, list(ti) AS ixs FROM cov GROUP BY id)
        |SELECT d.doc_id,
        |  CASE WHEN cl.ixs IS NULL THEN d.text
        |    ELSE COALESCE(list_aggregate(list_transform(
        |      list_filter(generate_series(1, len(d.l)),
        |        i -> NOT list_contains(cl.ixs, i-1)),
        |      i -> d.l[i]), 'string_agg', ' '), '') END AS text,
        |  CAST(COALESCE(len(cl.ixs), 0) AS BIGINT) AS n_removed
        |FROM d LEFT JOIN cl ON d.doc_id = cl.id
        |ORDER BY doc_id""".stripMargin,

    // same noisy-URL construction, then the canonicalization chain in
    // RE2: fragment -> lowercase authority (port-stripped, \1 backref)
    // -> tracking params ('g' flag: DuckDB replaces first-only by
    // default, Spark replaces all) -> separator cleanup -> slash
    "q120_url_canonical" ->
      """WITH b AS (SELECT doc_id,
        |   CASE WHEN doc_id % 2 = 0
        |     THEN 'HTTP://WWW.Site' || CAST(doc_id % 5 AS VARCHAR) || '.Example.COM'
        |     ELSE 'http://www.site' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' END
        |   || CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END
        |   || '/Page/' || CAST(doc_id % 7 AS VARCHAR)
        |   || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
        |   || CASE WHEN doc_id % 4 = 1 THEN '?utm_source=feed&ref=' || CAST(doc_id % 3 AS VARCHAR)
        |        WHEN doc_id % 4 = 2 THEN '?ref=' || CAST(doc_id % 3 AS VARCHAR)
        |          || '&fbclid=x' || CAST(doc_id AS VARCHAR)
        |        WHEN doc_id % 4 = 3 THEN '?gclid=y' || CAST(doc_id AS VARCHAR)
        |        ELSE '' END
        |   || CASE WHEN doc_id % 5 = 0 THEN '#sec' || CAST(doc_id AS VARCHAR) ELSE '' END
        |     AS raw_url FROM documents),
        | f AS (SELECT doc_id, raw_url,
        |   regexp_replace(raw_url, '#.*', '', 'g') AS u0 FROM b),
        | a AS (SELECT doc_id, raw_url, u0,
        |   regexp_extract(u0, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*') AS auth FROM f),
        | j AS (SELECT doc_id, raw_url,
        |   regexp_replace(regexp_replace(lower(auth),
        |       '^(http://[^/:]*):80$', '\1'), '^(https://[^/:]*):443$', '\1')
        |     || substr(u0, len(auth) + 1) AS u1 FROM a),
        | t AS (SELECT doc_id, raw_url,
        |   regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(u1,
        |     '([?&])(?:utm_[A-Za-z]+|fbclid|gclid)=[^&#]*', '\1', 'g'),
        |     '&&+', '&', 'g'),
        |     '\?&', '?', 'g'), '[?&]+$', '', 'g'), '/$', '', 'g') AS canonical_url
        |   FROM j)
        |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_raw,
        |  CAST(count(DISTINCT raw_url) AS BIGINT) AS n_distinct_raw,
        |  min(doc_id) AS min_doc
        |FROM t GROUP BY 1 ORDER BY canonical_url""".stripMargin,

    // lag-collapse (null-safe IS DISTINCT FROM, (ts, event_id)
    // tie-break) then lead-close — the textbook SCD2 window build
    "q121_scd2" ->
      """WITH o AS (SELECT user_id, ts, event_type, event_id,
        |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        | c AS (SELECT user_id, ts, event_type, event_id FROM o
        |   WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        | v AS (SELECT user_id, event_type, ts AS valid_from,
        |   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c)
        |SELECT user_id, event_type, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, valid_from, event_type NULLS FIRST""".stripMargin,

    // chained filtered-min joins: each stage's earliest time strictly
    // after the previous stage's chosen time
    "q122_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS view_ts FROM events
        |   WHERE event_type = 'view' GROUP BY 1),
        | s2 AS (SELECT e.user_id, min(e.ts) AS click_ts FROM events e
        |   JOIN s1 ON e.user_id = s1.user_id
        |   WHERE e.event_type = 'click' AND e.ts > s1.view_ts GROUP BY 1),
        | s3 AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM events e
        |   JOIN s2 ON e.user_id = s2.user_id
        |   WHERE e.event_type = 'purchase' AND e.ts > s2.click_ts GROUP BY 1)
        |SELECT s1.user_id, view_ts, click_ts, purchase_ts,
        |  CAST(1 + CASE WHEN click_ts IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN purchase_ts IS NULL THEN 0 ELSE 1 END AS BIGINT) AS depth
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |  LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id NULLS FIRST""".stripMargin,

    // Monday-truncated weeks in both engines; offsets are exact
    // multiples of 7 days by construction
    "q123_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        |   FROM events),
        | c AS (SELECT user_id, min(week) AS cohort_week FROM a GROUP BY 1)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, a.week) // 7 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    // three unrolled integer-ppm PageRank rounds; // (floor) mirrors
    // Spark's DIV on the all-positive ranks, sum() promotes to HUGEINT
    // so 85*s never overflows before the CAST back
    "q124_pagerank" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        | e AS (SELECT doc_id AS src, (doc_id*7+1) % nn.n AS dst FROM documents, nn
        |   UNION ALL SELECT doc_id, (doc_id*13+5) % nn.n FROM documents, nn
        |   UNION ALL SELECT doc_id, (doc_id*31+11) % nn.n FROM documents, nn),
        | od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
        | nd AS (SELECT DISTINCT src AS node FROM e
        |   UNION SELECT DISTINCT dst FROM e),
        | r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nd),
        | c1 AS (SELECT e.dst AS node, sum(r0.r // od.outdeg) AS s FROM e
        |   JOIN r0 ON e.src = r0.node JOIN od ON e.src = od.src GROUP BY 1),
        | r1 AS (SELECT nd.node,
        |   CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
        |   FROM nd LEFT JOIN c1 USING (node)),
        | c2 AS (SELECT e.dst AS node, sum(r1.r // od.outdeg) AS s FROM e
        |   JOIN r1 ON e.src = r1.node JOIN od ON e.src = od.src GROUP BY 1),
        | r2 AS (SELECT nd.node,
        |   CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
        |   FROM nd LEFT JOIN c2 USING (node)),
        | c3 AS (SELECT e.dst AS node, sum(r2.r // od.outdeg) AS s FROM e
        |   JOIN r2 ON e.src = r2.node JOIN od ON e.src = od.src GROUP BY 1),
        | r3 AS (SELECT nd.node,
        |   CAST(150000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
        |   FROM nd LEFT JOIN c3 USING (node))
        |SELECT node AS doc_id, r AS rank_ppm FROM r3 ORDER BY doc_id""".stripMargin,

    // q124's unrolled chain with the restart paid ONLY to the seed
    // flag (doc_id % 83 = 0): three integer-ppm personalized rounds
    "q323_ppr" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        | e AS (SELECT doc_id AS src, (doc_id*7+1) % nn.n AS dst FROM documents, nn
        |   UNION ALL SELECT doc_id, (doc_id*13+5) % nn.n FROM documents, nn
        |   UNION ALL SELECT doc_id, (doc_id*31+11) % nn.n FROM documents, nn),
        | od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
        | nd AS (SELECT DISTINCT src AS node FROM e
        |   UNION SELECT DISTINCT dst FROM e),
        | fl AS (SELECT node, CASE WHEN node % 83 = 0 THEN 1 ELSE 0 END AS sd
        |   FROM nd),
        | r0 AS (SELECT node, CAST(sd * 1000000 AS BIGINT) AS r FROM fl),
        | c1 AS (SELECT e.dst AS node, sum(r0.r // od.outdeg) AS s FROM e
        |   JOIN r0 ON e.src = r0.node JOIN od ON e.src = od.src GROUP BY 1),
        | r1 AS (SELECT fl.node,
        |   CAST(fl.sd * 150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
        |   FROM fl LEFT JOIN c1 USING (node)),
        | c2 AS (SELECT e.dst AS node, sum(r1.r // od.outdeg) AS s FROM e
        |   JOIN r1 ON e.src = r1.node JOIN od ON e.src = od.src GROUP BY 1),
        | r2 AS (SELECT fl.node,
        |   CAST(fl.sd * 150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
        |   FROM fl LEFT JOIN c2 USING (node)),
        | c3 AS (SELECT e.dst AS node, sum(r2.r // od.outdeg) AS s FROM e
        |   JOIN r2 ON e.src = r2.node JOIN od ON e.src = od.src GROUP BY 1),
        | r3 AS (SELECT fl.node,
        |   CAST(fl.sd * 150000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
        |   FROM fl LEFT JOIN c3 USING (node))
        |SELECT node AS doc_id, r AS rank_ppm FROM r3 ORDER BY doc_id""".stripMargin,

    // blocking eval (q324): the banded candidates (minhashCtes' px) and
    // the prefix-filter truth (q233's chain, t-prefixed to avoid CTE
    // name collisions) recomputed from scratch, then the Christen
    // completeness/reduction metrics over the two pair sets
    "q324_blocking_eval" ->
      s"""WITH $minhashCtes,
         | tsets AS (SELECT doc_id AS id,
         |    list_sort(list_distinct(list_transform($trigrams,
         |      s -> ('0x'||substr(md5('0:'||s),1,8))::BIGINT))) AS hs
         |   FROM d),
         | tsized AS (SELECT id, hs, len(hs) AS n FROM tsets WHERE len(hs) > 0),
         | tsh AS (SELECT id, unnest(hs) AS th FROM tsized),
         | tdf AS (SELECT th, count(*) AS dd FROM tsh GROUP BY 1),
         | tranked AS (SELECT id, th,
         |    row_number() OVER (PARTITION BY id ORDER BY dd, th) AS rk
         |   FROM tsh JOIN tdf USING (th)),
         | tprefix AS (SELECT r.id, r.th FROM tranked r JOIN tsized s ON r.id = s.id
         |   WHERE r.rk <= s.n - (7 * s.n + 9) // 10 + 1),
         | tcand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |   FROM tprefix a JOIN tprefix b ON a.th = b.th AND a.id < b.id),
         | tv AS (SELECT id_a, id_b,
         |    len(list_intersect(sa.hs, sb.hs)) AS inter, sa.n AS na, sb.n AS nb
         |   FROM tcand JOIN tsized sa ON id_a = sa.id JOIN tsized sb ON id_b = sb.id),
         | tru AS MATERIALIZED (SELECT id_a, id_b FROM tv
         |   WHERE inter * 10 >= 7 * (na + nb - inter)),
         | pxm AS MATERIALIZED (SELECT id_a, id_b FROM px),
         | nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM tsized),
         | cnts AS (SELECT
         |   (SELECT count(*) FROM tru) AS n_true,
         |   (SELECT count(*) FROM pxm) AS n_candidates,
         |   (SELECT count(*) FROM tru JOIN pxm USING (id_a, id_b)) AS n_found)
         |SELECT nd.n_docs,
         | CAST((CAST(nd.n_docs AS HUGEINT) * (nd.n_docs - 1)) // 2 AS BIGINT)
         |   AS n_total_pairs,
         | CAST(cnts.n_candidates AS BIGINT) AS n_candidates,
         | CAST(cnts.n_true AS BIGINT) AS n_true,
         | CAST(cnts.n_found AS BIGINT) AS n_found,
         | CAST(CASE WHEN cnts.n_true > 0
         |   THEN (cnts.n_found * 1000000) // cnts.n_true ELSE 0 END AS BIGINT)
         |   AS completeness_ppm,
         | CAST(CASE WHEN nd.n_docs > 1
         |   THEN 1000000 - (CAST(cnts.n_candidates AS HUGEINT) * 1000000)
         |     // ((CAST(nd.n_docs AS HUGEINT) * (nd.n_docs - 1)) // 2)
         |   ELSE 0 END AS BIGINT) AS reduction_ratio_ppm
         |FROM nd CROSS JOIN cnts ORDER BY n_docs""".stripMargin,

    // per-key rank-selected order statistics: the oracle picks each
    // language's value at rank 1 + (n-1)*p // 1000 with a per-key
    // row_number — value-deterministic under ties, same rule as q319's
    // pooled grid one key down
    "q325_group_quantiles" ->
      s"""WITH q AS (SELECT lang,
         |    CAST($qualityPpmSql AS BIGINT) AS v FROM documents
         |   WHERE lang IS NOT NULL),
         | r AS (SELECT lang, v,
         |   row_number() OVER (PARTITION BY lang ORDER BY v) AS rn,
         |   count(*) OVER (PARTITION BY lang) AS n FROM q),
         | g AS (SELECT unnest([500, 900, 990]) AS p)
         |SELECT r.lang, CAST(g.p AS BIGINT) AS permille,
         | CAST(r.v AS BIGINT) AS q_ppm, CAST(r.n AS BIGINT) AS n_docs
         |FROM r JOIN g ON r.rn = 1 + ((r.n - 1) * g.p) // 1000
         |ORDER BY lang, permille""".stripMargin,

    // per-key ntile against DuckDB's NATIVE window ntile — an
    // independent implementation of the standard assignment the
    // engine computes arithmetically from keyed histogram ranks
    "q326_group_ntile" ->
      s"""WITH q AS (SELECT doc_id, lang,
         |    CAST($qualityPpmSql AS BIGINT) AS quality_ppm FROM documents
         |   WHERE lang IS NOT NULL)
         |SELECT doc_id, lang, quality_ppm,
         | CAST(ntile(4) OVER (PARTITION BY lang
         |   ORDER BY quality_ppm, doc_id) AS BIGINT) AS quartile
         |FROM q ORDER BY doc_id""".stripMargin,

    // leakage-safe split: q46's recursive closure gives the cluster
    // label; q51's tag arithmetic applied to the LABEL instead of the
    // doc id. Same md5 basis-point buckets, seed 2.
    "q327_leak_safe_split" ->
      s"""WITH RECURSIVE $minhashCtes,
         | edges AS (SELECT id_a AS src, id_b AS dst FROM px
         |           UNION ALL SELECT id_b, id_a FROM px),
         | reach(id, r) AS (
         |   SELECT doc_id, doc_id FROM documents
         |   UNION
         |   SELECT e.src, reach.r FROM reach JOIN edges e ON e.dst = reach.id),
         | lbl AS (SELECT id AS doc_id, min(r) AS cluster_id
         |         FROM reach GROUP BY 1),
         | s AS (SELECT doc_id, cluster_id,
         |   ('0x'||substr(md5('2:'||cluster_id),1,8))::BIGINT % 10000 AS sk
         |  FROM lbl)
         |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
         | CASE WHEN sk < 9000 THEN 'train' WHEN sk < 9500 THEN 'valid'
         |      ELSE 'test' END AS split
         |FROM s ORDER BY doc_id""".stripMargin,

    // split-leakage audit: straddle counts of the SAME banded candidate
    // pairs under the per-document tag vs the per-cluster tag; the
    // cluster row must read 0 leaked by construction
    "q328_split_leakage" ->
      s"""WITH RECURSIVE $minhashCtes,
         | edges AS (SELECT id_a AS src, id_b AS dst FROM px
         |           UNION ALL SELECT id_b, id_a FROM px),
         | reach(id, r) AS (
         |   SELECT doc_id, doc_id FROM documents
         |   UNION
         |   SELECT e.src, reach.r FROM reach JOIN edges e ON e.dst = reach.id),
         | lbl AS (SELECT id AS doc_id, min(r) AS cluster_id
         |         FROM reach GROUP BY 1),
         | nv AS (SELECT doc_id AS id,
         |   CASE WHEN ('0x'||substr(md5('2:'||doc_id),1,8))::BIGINT % 10000 < 9000 THEN 'train'
         |        WHEN ('0x'||substr(md5('2:'||doc_id),1,8))::BIGINT % 10000 < 9500 THEN 'valid'
         |        ELSE 'test' END AS tag FROM documents),
         | cv AS (SELECT doc_id AS id,
         |   CASE WHEN ('0x'||substr(md5('2:'||cluster_id),1,8))::BIGINT % 10000 < 9000 THEN 'train'
         |        WHEN ('0x'||substr(md5('2:'||cluster_id),1,8))::BIGINT % 10000 < 9500 THEN 'valid'
         |        ELSE 'test' END AS tag FROM lbl),
         | pc AS (SELECT count(*) AS n_pairs,
         |         coalesce(sum(CASE WHEN a.tag <> b.tag THEN 1 ELSE 0 END), 0) AS n_leaked
         |        FROM px JOIN cv a ON px.id_a = a.id JOIN cv b ON px.id_b = b.id),
         | pn AS (SELECT count(*) AS n_pairs,
         |         coalesce(sum(CASE WHEN a.tag <> b.tag THEN 1 ELSE 0 END), 0) AS n_leaked
         |        FROM px JOIN nv a ON px.id_a = a.id JOIN nv b ON px.id_b = b.id)
         |SELECT 'cluster' AS scheme, CAST(n_pairs AS BIGINT) AS n_pairs,
         | CAST(n_leaked AS BIGINT) AS n_leaked,
         | CAST(CASE WHEN n_pairs = 0 THEN 0
         |      ELSE n_leaked * 1000000 // n_pairs END AS BIGINT) AS leak_ppm
         |FROM pc
         |UNION ALL
         |SELECT 'naive', CAST(n_pairs AS BIGINT), CAST(n_leaked AS BIGINT),
         | CAST(CASE WHEN n_pairs = 0 THEN 0
         |      ELSE n_leaked * 1000000 // n_pairs END AS BIGINT)
         |FROM pn
         |ORDER BY scheme""".stripMargin,

    // q37's cosine with the different-label predicate; null labels out
    // on both sides
    "q125_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS qlabel
         |   FROM embeddings WHERE vec_id < 5 AND label IS NOT NULL),
         | c AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS cv, label AS clabel
         |   FROM embeddings WHERE label IS NOT NULL),
         | s AS (SELECT qid, vid, clabel, $cosExpr AS cos FROM q, c
         |   WHERE qlabel <> clabel),
         | r AS (SELECT qid, vid, clabel, cos,
         |   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS BIGINT)
         |     AS "rank" FROM s)
         |SELECT qid, vid, CAST(clabel AS BIGINT) AS neg_label,
         |  round(cos, 6) AS cos, "rank"
         |FROM r WHERE "rank" <= 10 ORDER BY qid, "rank"""".stripMargin,

    // groups on the raw 32-token prefix string (Spark groups on its
    // md5-128 fingerprint — same partition of docs); canonical =
    // longest, ties min id
    "q126_truncation_dups" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        | p AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
        |     array_to_string(l[1:32], ' ') AS pre FROM d WHERE len(l) >= 32),
        | w AS (SELECT pre, doc_id, n_tokens,
        |     row_number() OVER (PARTITION BY pre
        |       ORDER BY n_tokens DESC, doc_id) AS rn,
        |     count(*) OVER (PARTITION BY pre) AS cnt FROM p),
        | c AS (SELECT pre, doc_id AS canonical_id,
        |     n_tokens AS canonical_n_tokens FROM w WHERE rn = 1 AND cnt >= 2)
        |SELECT p.doc_id, p.n_tokens, c.canonical_id, c.canonical_n_tokens
        |FROM p JOIN c USING (pre) ORDER BY p.doc_id""".stripMargin,

    // q121's SCD2 build + the interval-cover filter at T
    "q127_snapshot_at" ->
      """WITH o AS (SELECT user_id, ts, event_type, event_id,
        |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        | c AS (SELECT user_id, ts, event_type, event_id FROM o
        |   WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        | v AS (SELECT user_id, event_type, ts AS valid_from,
        |   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c)
        |SELECT user_id, event_type, valid_from FROM v
        |WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
        |ORDER BY user_id""".stripMargin,

    // RANK ties + NULLS FIRST pinned explicitly (DuckDB defaults NULLS
    // LAST on ASC; Spark defaults NULLS FIRST)
    "q128_quality_percentile" ->
      s"""WITH q AS (SELECT doc_id, lang,
         |    CAST($qualityPpmSql AS BIGINT) AS quality_ppm FROM documents),
         | r AS (SELECT doc_id, lang, quality_ppm,
         |   rank() OVER (PARTITION BY lang ORDER BY quality_ppm NULLS FIRST) AS rk,
         |   count(*) OVER (PARTITION BY lang) AS cnt FROM q)
         |SELECT doc_id, lang, quality_ppm,
         |  CAST(CASE WHEN cnt > 1 THEN ((rk - 1) * 1000000) // (cnt - 1)
         |       ELSE 0 END AS BIGINT) AS pct_ppm
         |FROM r ORDER BY doc_id""".stripMargin,

    // native DuckDB forward ASOF (<=): an independent engine's as-of,
    // not a window transliteration
    "q129_asof_forward" ->
      """SELECT e.event_id, e.user_id, o.o_orderkey AS next_orderkey
        |FROM events e
        |ASOF LEFT JOIN (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |                FROM orders GROUP BY 1,2) o
        |ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        |ORDER BY event_id""".stripMargin,

    // both native ASOF directions + the closer-wins-ties-backward rule
    "q130_asof_nearest" ->
      """WITH u AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |   FROM orders GROUP BY 1,2),
        | b AS (SELECT e.event_id, e.user_id, e.ts,
        |     o.o_orderkey AS bk, o.o_orderdate AS bt
        |   FROM events e ASOF LEFT JOIN u o
        |   ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate),
        | f AS (SELECT e.event_id, o.o_orderkey AS fk, o.o_orderdate AS ft
        |   FROM events e ASOF LEFT JOIN u o
        |   ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN bk IS NULL THEN fk
        |       WHEN fk IS NULL THEN bk
        |       WHEN epoch_us(ts) - epoch_us(bt) <= epoch_us(ft) - epoch_us(ts)
        |         THEN bk
        |       ELSE fk END AS nearest_orderkey
        |FROM b JOIN f USING (event_id)
        |ORDER BY event_id""".stripMargin,

    // q71's per-term weights rounded to 6, scaled to integer micros,
    // BIGINT-summed (exact, order-independent) over the query-term join
    "q131_bm25_topk" ->
      s"""WITH $bm25Ctes,
         | ag AS (SELECT qid, id,
         |   CAST(sum(CAST(round(w * 1000000) AS BIGINT)) AS BIGINT) AS score_micro,
         |   CAST(count(*) AS BIGINT) AS n_matched
         |   FROM bw JOIN qq USING (token) GROUP BY 1, 2),
         | r AS (SELECT qid, id, score_micro, n_matched,
         |   CAST(row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, id)
         |     AS BIGINT) AS rnk FROM ag)
         |SELECT CAST(qid AS BIGINT) AS qid, id AS doc_id, score_micro,
         |  n_matched, rnk
         |FROM r WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    // adjacent-token phrase scan via list positions; overlapping
    // occurrences count (('b b b') has 'b b' at 2 starts)
    "q132_phrase_search" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        | s AS (SELECT doc_id, list_filter(generate_series(1, len(l) - 1),
        |     i -> l[i] = 'batch' AND l[i+1] = 'batch') AS st FROM d)
        |SELECT doc_id, CAST(len(st) AS BIGINT) AS n_hits,
        |  CAST(st[1] - 1 AS BIGINT) AS first_pos
        |FROM s WHERE len(st) > 0 ORDER BY doc_id""".stripMargin,

    // integer priority sampling: hash*1e6 // weight, k lowest win;
    // seed 3 mirrors the operator's md5Hash32 format
    "q133_weighted_sample" ->
      s"""WITH q AS (SELECT doc_id, lang,
         |    CAST($qualityPpmSql AS BIGINT) AS weight_ppm FROM documents),
         | p AS (SELECT doc_id, lang, weight_ppm,
         |   CAST((('0x'||substr(md5('3:'||doc_id),1,8))::BIGINT * 1000000)
         |     // weight_ppm AS BIGINT) AS priority
         |   FROM q WHERE weight_ppm IS NOT NULL AND weight_ppm > 0),
         | r AS (SELECT *, row_number() OVER (ORDER BY priority, doc_id) AS rn
         |   FROM p)
         |SELECT doc_id, lang, weight_ppm, priority FROM r
         |WHERE rn <= 100 ORDER BY doc_id""".stripMargin,

    // exact-dup verdicts (min-id keeper per md5 group) rolled up with
    // GROUPING() disambiguating subtotal rows
    "q134_dedup_report" ->
      """WITH f AS (SELECT doc_id, source, lang, md5(text) AS fp FROM documents),
        | k AS (SELECT fp AS kfp, min(doc_id) AS keep FROM f GROUP BY 1),
        | v AS (SELECT source, lang,
        |   CASE WHEN doc_id != keep THEN 1 ELSE 0 END AS is_dup
        |   FROM f JOIN k ON f.fp IS NOT DISTINCT FROM k.kfp)
        |SELECT source, lang, CAST(GROUPING(source, lang) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(is_dup) AS BIGINT) AS n_dups,
        |  CAST((sum(is_dup) * 1000000) // count(*) AS BIGINT) AS dup_ppm
        |FROM v GROUP BY ROLLUP(source, lang)
        |ORDER BY gid, source NULLS FIRST, lang NULLS FIRST""".stripMargin,

    // q57's exact rank-median applied twice (value, then |v - med|);
    // outlier predicate on the shared doubles
    "q135_mad_outliers" ->
      """WITH b AS (SELECT event_type AS key, value AS v FROM events
        |   WHERE value IS NOT NULL),
        | r1 AS (SELECT key, v, row_number() OVER (PARTITION BY key ORDER BY v) AS rn,
        |   count(*) OVER (PARTITION BY key) AS n FROM b),
        | m AS (SELECT key, CAST(max(n) AS BIGINT) AS n,
        |   max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
        |   FROM r1 GROUP BY 1),
        | d AS (SELECT b.key, b.v, m.med, m.n, abs(b.v - m.med) AS dev
        |   FROM b JOIN m USING (key)),
        | r2 AS (SELECT key, dev, n,
        |   row_number() OVER (PARTITION BY key ORDER BY dev) AS rn2 FROM d),
        | md AS (SELECT key,
        |   max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END) AS mad
        |   FROM r2 GROUP BY 1)
        |SELECT d.key AS event_type, CAST(max(d.n) AS BIGINT) AS n,
        |  max(d.med) AS med, max(md.mad) AS mad,
        |  CAST(sum(CASE WHEN d.dev > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM d JOIN md USING (key) GROUP BY 1 ORDER BY 1""".stripMargin,

    // q70's gap-filled daily cells + the cross-multiplied integer
    // z-test over the trailing-week frame (sum -> HUGEINT keeps the
    // products exact)
    "q136_daily_anomalies" ->
      """WITH c AS (SELECT event_type,
        |   CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS day_sec,
        |   count(*) AS n FROM events GROUP BY 1, 2),
        | sp AS (SELECT event_type, min(day_sec) AS lo, max(day_sec) AS hi
        |   FROM c GROUP BY 1
        |   HAVING max(day_sec) - min(day_sec) < CAST(100000 AS BIGINT) * 86400),
        | g AS (SELECT event_type, unnest(generate_series(lo, hi, 86400)) AS day_sec
        |   FROM sp),
        | d AS (SELECT g.event_type, g.day_sec,
        |   CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        |   FROM g LEFT JOIN c ON g.event_type = c.event_type
        |     AND g.day_sec = c.day_sec),
        | wnd AS (SELECT event_type, day_sec, n_events,
        |   count(*) OVER w AS np, sum(n_events) OVER w AS s,
        |   sum(n_events*n_events) OVER w AS q
        |   FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day_sec
        |     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day_sec, n_events,
        |  np >= 3 AND (np*n_events - s)*(np*n_events - s) > 9*(np*q - s*s)
        |    AS is_anomaly
        |FROM wnd ORDER BY event_type, day_sec""".stripMargin,

    // q28's exact+flag contract: the oracle pins the exact distincts
    // and asserts the merged-sketch estimate landed within 10%
    "q137_sketch_rollup" ->
      """WITH d AS (SELECT event_type,
        |   CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS day_sec, user_id
        |   FROM events WHERE ts IS NOT NULL)
        |SELECT event_type, CAST(count(DISTINCT day_sec) AS BIGINT) AS n_days,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, true AS ok
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // native ASOF backward join + the 24h lookback window; touch
    // instants deduped per (user, ts) to satisfy the as-of contract
    "q138_attribution" ->
      """WITH c AS (SELECT user_id, ts AS conv_time FROM events
        |   WHERE event_type = 'purchase'),
        | t AS (SELECT DISTINCT user_id, ts AS touch_time FROM events
        |   WHERE event_type = 'click'),
        | j AS (SELECT c.user_id, c.conv_time, t.touch_time
        |   FROM c ASOF LEFT JOIN t
        |   ON c.user_id = t.user_id AND c.conv_time >= t.touch_time)
        |SELECT user_id, conv_time,
        |  CASE WHEN touch_time IS NOT NULL
        |     AND epoch_us(conv_time) - epoch_us(touch_time) <= 86400000000
        |    THEN touch_time END AS touch_time,
        |  touch_time IS NOT NULL
        |    AND epoch_us(conv_time) - epoch_us(touch_time) <= 86400000000
        |    AS attributed
        |FROM j ORDER BY user_id, conv_time""".stripMargin,

    // one-scan GROUPING SETS data card; integer floor mean; GROUPING()
    // bit order matches Spark's grouping_id for (source, lang)
    "q139_data_card" ->
      s"""WITH d AS (SELECT source, lang,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         |    CAST($qualityPpmSql AS BIGINT) AS q FROM documents)
         |SELECT source, lang, CAST(GROUPING(source, lang) AS BIGINT) AS gid,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(sum(q) // count(*) AS BIGINT) AS mean_quality_ppm,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM d GROUP BY GROUPING SETS ((source, lang), (source), ())
         |ORDER BY gid, source NULLS FIRST, lang NULLS FIRST""".stripMargin,

    // Mirrors graft.ext.Bmff.syntheticMjpeg's closed-form frame layout
    // (n frames, odd-k sync samples, per-frame width/height/gray) — the
    // Spark side must parse the container AND decode real JPEG bytes;
    // the oracle recomputes the decoded stats arithmetically, which is
    // exact because uniform-gray frames round-trip the codec losslessly
    "q140_mjpeg_frames" ->
      """WITH d AS (SELECT doc_id, 4 + doc_id % 3 AS n FROM documents
        |   WHERE doc_id % 8 = 0),
        | s AS (SELECT doc_id, unnest(generate_series(1, n)) AS k FROM d),
        | kf AS (SELECT doc_id, (k + 1) // 2 AS kf_idx, k FROM s WHERE k % 2 = 1)
        |SELECT doc_id, CAST(kf_idx AS BIGINT) AS kf_idx,
        |  CAST(8 + (doc_id + 3 * k) % 17 AS BIGINT) AS width,
        |  CAST(8 + (2 * doc_id + 5 * k) % 13 AS BIGINT) AS height,
        |  CAST(((31 * doc_id + 17 * k) % 256) * 1000000 // 255 AS BIGINT)
        |    AS mean_pixel_ppm
        |FROM kf ORDER BY doc_id, kf_idx""".stripMargin,

    // RETRAINS the k-means centroids from scratch (kmeansCtes: 2
    // integer-deterministic Lloyd's rounds) and must land on identical
    // assignments, probes and top-k as SimSearch.topKIvfKmeans
    "q141_ann_ivf_kmeans" ->
      s"""WITH ${kmeansCtes(nlist = 8, iters = 2, dim = 64)},
         | ac AS (SELECT vid, cent_id FROM (
         |        SELECT e.vec_id AS vid, e.v, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $kmeansDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p2 p) WHERE cr = 1),
         | aq AS (SELECT qid, cent_id FROM (
         |        SELECT e.vec_id AS qid, e.v, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $kmeansDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p2 p WHERE e.vec_id < 5) WHERE cr <= 2),
         | pairs AS (SELECT q.qid, c.vid, qd.v AS qv, cd.v AS cv
         |        FROM aq q JOIN ac c ON q.cent_id = c.cent_id
         |        JOIN dv qd ON qd.vec_id = q.qid
         |        JOIN dv cd ON cd.vec_id = c.vid
         |        WHERE q.qid <> c.vid),
         | s AS (SELECT qid, vid, $cosExpr AS cos FROM pairs),
         | r AS (SELECT qid, vid, cos,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS BIGINT) AS "rank"
         |       FROM s)
         |SELECT qid, vid, round(cos, 6) AS cos, "rank" FROM r WHERE "rank" <= 10
         |ORDER BY qid, "rank"""".stripMargin,

    // Greedy BPE re-derived from scratch over the frozen sampleMerges
    // rules: each recursion step merges the FIRST occurrence of the
    // LOWEST-rank adjacent pair — equivalent to the tokenizer's
    // round-based merging because any rule consuming a merged token
    // ranks after the rule that created it; the final segmentation is
    // each word's minimum-length state
    "q142_bpe_tokens" ->
      s"""WITH RECURSIVE
         | dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         | w AS (SELECT DISTINCT word FROM dw WHERE length(word) > 0),
         | seg(word, parts) AS (
         |   SELECT word, list_transform(generate_series(1, length(word)), i -> word[i:i]) FROM w
         |   UNION ALL
         |   SELECT word, parts[1:pos-1] || [parts[pos] || parts[pos+1]] || parts[pos+2:len(parts)]
         |   FROM (SELECT word, parts, list_min(rk) AS mr, list_position(rk, list_min(rk)) AS pos
         |         FROM (SELECT word, parts,
         |                list_transform(generate_series(1, len(parts)-1),
         |                  i -> ${bpeRankCase("parts[i]", "parts[i+1]")}) AS rk
         |               FROM seg))
         |   WHERE mr < 999999),
         | fin AS (SELECT word, CAST(min(len(parts)) AS BIGINT) AS n_sub FROM seg GROUP BY 1),
         | cnt AS (SELECT dw.doc_id, sum(fin.n_sub) AS n
         |         FROM dw JOIN fin ON dw.word = fin.word GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_bpe_tokens
         |FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Mirrors graft.ext.Png.syntheticGradient + ImageResize's integer
    // nearest-neighbor: resized pixel (x,y) reads source
    // (x*w//rw, y*h//rh) of the gradient g = (7x + 13y + id) % 256;
    // the Spark side must actually decode the PNG bytes and resample
    "q143_png_resize" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 17 AS w, 8 + (2 * doc_id) % 13 AS h
        |   FROM documents WHERE doc_id % 8 = 0),
        | r AS (SELECT doc_id, w, h,
        |    greatest(1, (8 * w) // greatest(w, h)) AS rw,
        |    greatest(1, (8 * h) // greatest(w, h)) AS rh FROM d),
        | xs AS (SELECT doc_id, w, h, rw, rh,
        |    unnest(generate_series(0, rw - 1)) AS x FROM r),
        | ys AS (SELECT doc_id, w, h, rw, rh, x,
        |    unnest(generate_series(0, rh - 1)) AS y FROM xs),
        | px AS (SELECT doc_id, rw, rh,
        |    (7 * ((x * w) // rw) + 13 * ((y * h) // rh) + doc_id) % 256 AS g FROM ys)
        |SELECT doc_id, CAST(rw AS BIGINT) AS rw, CAST(rh AS BIGINT) AS rh,
        |  CAST(sum(g) * 1000000 // (255 * rw * rh) AS BIGINT) AS mean_pixel_ppm
        |FROM px GROUP BY doc_id, rw, rh ORDER BY doc_id""".stripMargin,

    // the FULL REBUILD over the whole log (q121's SQL verbatim) — the
    // Spark side builds the dimension from the first half and MERGES
    // the second half incrementally (scd2Apply); hash equality IS the
    // incremental-equals-rebuild invariant
    "q144_scd2_apply" ->
      """WITH o AS (SELECT user_id, ts, event_type, event_id,
        |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        | c AS (SELECT user_id, ts, event_type, event_id FROM o
        |   WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        | v AS (SELECT user_id, event_type, ts AS valid_from,
        |   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c)
        |SELECT user_id, event_type, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, valid_from, event_type NULLS FIRST""".stripMargin,

    // independent ALGORITHM: the operator fans cells out to trailing
    // anchors (explode); the oracle range-JOINS days against cells —
    // both must land on the same exact distinct counts
    "q145_rolling_wau" ->
      """WITH cells AS (SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS day_sec
        |   FROM events WHERE ts IS NOT NULL),
        | days AS (SELECT DISTINCT day_sec FROM cells),
        | dau AS (SELECT day_sec, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |   FROM cells GROUP BY 1),
        | wau AS (SELECT d.day_sec, CAST(count(DISTINCT c.user_id) AS BIGINT) AS wau
        |   FROM days d JOIN cells c
        |     ON c.day_sec BETWEEN d.day_sec - 6*86400 AND d.day_sec
        |   GROUP BY 1)
        |SELECT days.day_sec, dau.dau, wau.wau
        |FROM days JOIN dau ON days.day_sec = dau.day_sec
        |  JOIN wau ON days.day_sec = wau.day_sec
        |ORDER BY days.day_sec""".stripMargin,

    // BOTH retrieval legs recomputed from scratch (q131's BM25 chain +
    // q37's cosine chain over qids 1-3), then integer RRF fusion:
    // 10^6 // (60 + rank) per list, exact both engines
    "q146_rrf_fusion" -> {
      s"""WITH $bm25Ctes,
         | ag AS (SELECT qid, id,
         |   CAST(sum(CAST(round(w * 1000000) AS BIGINT)) AS BIGINT) AS score_micro
         |   FROM bw JOIN qq USING (token) GROUP BY 1, 2),
         | lex AS (SELECT qid, id,
         |   row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, id) AS rnk
         |   FROM ag QUALIFY rnk <= 10),
         | ee AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | cc AS (SELECT vec_id AS vid, v AS cv FROM ee),
         | qv AS (SELECT vec_id AS qid, v AS qv FROM ee WHERE vec_id IN (1, 2, 3)),
         | ss AS (SELECT qid, vid, $cosExpr AS cos FROM qv, cc WHERE qid <> vid),
         | sem AS (SELECT qid, vid AS id,
         |   row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
         |   FROM ss QUALIFY rnk <= 10),
         | u AS (SELECT qid, id, rnk FROM lex
         |   UNION ALL SELECT qid, id, rnk FROM sem),
         | f AS (SELECT qid, id,
         |   CAST(sum(1000000 // (60 + rnk)) AS BIGINT) AS rrf_micro,
         |   CAST(count(*) AS BIGINT) AS n_lists FROM u GROUP BY 1, 2),
         | rr AS (SELECT qid, id, rrf_micro, n_lists,
         |   CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf_micro DESC, id)
         |     AS BIGINT) AS "rank" FROM f)
         |SELECT CAST(qid AS BIGINT) AS qid, id AS doc_id, rrf_micro, n_lists, "rank"
         |FROM rr WHERE "rank" <= 10 ORDER BY qid, "rank"""".stripMargin
    },

    // q133's priority formula ranked PER STRATUM (lang) instead of
    // globally — 20 winners per language
    "q147_stratum_sample" ->
      s"""WITH q AS (SELECT doc_id, lang,
         |    CAST($qualityPpmSql AS BIGINT) AS weight_ppm FROM documents),
         | p AS (SELECT doc_id, lang, weight_ppm,
         |   CAST((('0x'||substr(md5('3:'||doc_id),1,8))::BIGINT * 1000000)
         |     // weight_ppm AS BIGINT) AS priority
         |   FROM q WHERE weight_ppm IS NOT NULL AND weight_ppm > 0),
         | r AS (SELECT *, row_number()
         |     OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rn
         |   FROM p)
         |SELECT doc_id, lang, weight_ppm, priority FROM r
         |WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

    // ring-plus-random synthetic graph (i→i+1, i→i+2 guarantee a
    // triangle per node; i→7i+1 adds irregular structure) canonicalized
    // to undirected distinct edges, degree-(then id)-ordered
    // orientation, wedge join closed by the oriented tip edge — each
    // triangle exactly once, then exploded to its three corners
    "q148_triangles" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        | e0 AS (SELECT doc_id AS src, (doc_id+1) % nn.n AS dst FROM documents, nn
        |   UNION ALL SELECT doc_id, (doc_id+2) % nn.n FROM documents, nn
        |   UNION ALL SELECT doc_id, (doc_id*7+1) % nn.n FROM documents, nn),
        | und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |   FROM e0 WHERE src <> dst),
        | nodes AS (SELECT u AS m FROM und UNION ALL SELECT v FROM und),
        | deg AS (SELECT m, count(*) AS d FROM nodes GROUP BY 1),
        | wk AS (SELECT und.u, und.v,
        |    du.d * 2147483648 + und.u AS ku, dv.d * 2147483648 + und.v AS kv
        |   FROM und JOIN deg du ON du.m = und.u JOIN deg dv ON dv.m = und.v),
        | o AS (SELECT CASE WHEN ku < kv THEN u ELSE v END AS x,
        |    CASE WHEN ku < kv THEN v ELSE u END AS y,
        |    CASE WHEN ku < kv THEN kv ELSE ku END AS ky FROM wk),
        | w AS (SELECT e1.x, e1.y AS p, e2.y AS q
        |   FROM o e1 JOIN o e2 ON e1.x = e2.x AND e1.ky < e2.ky),
        | tri AS (SELECT w.x, w.p, w.q FROM w
        |   JOIN o ON o.x = w.p AND o.y = w.q),
        | corners AS (SELECT x AS node FROM tri
        |   UNION ALL SELECT p FROM tri UNION ALL SELECT q FROM tri)
        |SELECT node AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM corners GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // the dimension rebuilt with q121's collapse chain, then each fact
    // resolved by an explicit INTERVAL RANGE JOIN (vs the operator's
    // as-of-on-valid_from) — different algorithms, same rows; empty
    // equal-timestamp intervals can match nothing by construction
    "q149_dim_enrich" ->
      """WITH ch AS (SELECT user_id, ts,
        |    ((CAST(floor(value) AS BIGINT) % 5) + 5) % 5 AS tier, event_id
        |   FROM events WHERE event_id % 10 = 0),
        | o AS (SELECT user_id, ts, tier, event_id,
        |   lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM ch),
        | c AS (SELECT user_id, ts, tier, event_id FROM o
        |   WHERE rn = 1 OR tier IS DISTINCT FROM prev),
        | v AS (SELECT user_id, tier, ts AS valid_from,
        |   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c),
        | f AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 10 <> 0)
        |SELECT f.event_id, f.user_id, v.tier
        |FROM f LEFT JOIN v ON v.user_id = f.user_id
        |  AND v.valid_from <= f.ts AND (v.valid_to IS NULL OR f.ts < v.valid_to)
        |ORDER BY f.event_id""".stripMargin,

    // one UNION-ALL arm per profiled column, each over the same canonical
    // representation the Spark side profiles (doubles as exact micros,
    // timestamps as epoch seconds — BIGINT/STRING forms both engines
    // render identically); DuckDB's integer sum() is HUGEINT, so every
    // aggregate is pinned back to BIGINT
    "q150_profile" ->
      """WITH c AS (SELECT event_id, user_id, event_type,
        |   CAST(floor(value * 1000000) AS BIGINT) AS value_micros,
        |   CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events)
        |SELECT * FROM (
        | SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
        |  CAST(min(event_id) AS VARCHAR) AS min_repr,
        |  CAST(max(event_id) AS VARCHAR) AS max_repr FROM c
        | UNION ALL SELECT 'user_id', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT user_id) AS BIGINT),
        |  CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR) FROM c
        | UNION ALL SELECT 'event_type', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT event_type) AS BIGINT),
        |  CAST(min(event_type) AS VARCHAR), CAST(max(event_type) AS VARCHAR) FROM c
        | UNION ALL SELECT 'value_micros', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN value_micros IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT value_micros) AS BIGINT),
        |  CAST(min(value_micros) AS VARCHAR), CAST(max(value_micros) AS VARCHAR) FROM c
        | UNION ALL SELECT 'ts_sec', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN ts_sec IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT ts_sec) AS BIGINT),
        |  CAST(min(ts_sec) AS VARCHAR), CAST(max(ts_sec) AS VARCHAR) FROM c)
        |ORDER BY col_name""".stripMargin,

    // the three BFS rounds unrolled as CUMULATIVE reachability sets; each
    // node's distance is the first round that contains it — set
    // membership vs the engine's frontier anti-join, same distances
    "q151_bfs_levels" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        | e AS (SELECT DISTINCT src, dst FROM (
        |    SELECT doc_id AS src, (doc_id*7+1) % nn.n AS dst FROM documents, nn
        |    UNION ALL SELECT doc_id, (doc_id*13+5) % nn.n FROM documents, nn
        |    UNION ALL SELECT doc_id, (doc_id*31+11) % nn.n FROM documents, nn)
        |   WHERE src <> dst),
        | r0 AS (SELECT doc_id AS node FROM documents WHERE doc_id < 3),
        | r1 AS (SELECT node FROM r0 UNION SELECT e.dst FROM r0 JOIN e ON e.src = r0.node),
        | r2 AS (SELECT node FROM r1 UNION SELECT e.dst FROM r1 JOIN e ON e.src = r1.node),
        | r3 AS (SELECT node FROM r2 UNION SELECT e.dst FROM r2 JOIN e ON e.src = r2.node)
        |SELECT node AS doc_id, CAST(CASE
        |  WHEN node IN (SELECT node FROM r0) THEN 0
        |  WHEN node IN (SELECT node FROM r1) THEN 1
        |  WHEN node IN (SELECT node FROM r2) THEN 2
        |  ELSE 3 END AS BIGINT) AS dist
        |FROM r3 ORDER BY doc_id""".stripMargin,

    // q89's list-ops tokenization feeding Dice + both conditionals in
    // integer ppm; // is DuckDB floor division ≡ Spark DIV on positive
    // counts; the ORDER BY total order (dice, n, w1, w2) makes the
    // LIMIT cut deterministic on both engines
    "q152_collocations" ->
      """WITH d AS (SELECT string_split(text,' ') AS l FROM documents),
        | bi AS (SELECT unnest(list_transform(generate_series(1, len(l)-1),
        |    i -> l[i] || ' ' || l[i+1])) AS b FROM d),
        | c AS (SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
        |    count(*) AS n FROM bi GROUP BY 1, 2),
        | lm AS (SELECT w1, sum(n) AS nl FROM c GROUP BY 1),
        | rm AS (SELECT w2, sum(n) AS nr FROM c GROUP BY 1)
        |SELECT c.w1, c.w2, CAST(c.n AS BIGINT) AS n,
        | CAST((c.n * 2000000) // (lm.nl + rm.nr) AS BIGINT) AS dice_ppm,
        | CAST((c.n * 1000000) // lm.nl AS BIGINT) AS cond_ppm,
        | CAST((c.n * 1000000) // rm.nr AS BIGINT) AS rcond_ppm
        |FROM c JOIN lm USING (w1) JOIN rm USING (w2)
        |WHERE c.n >= 5
        |ORDER BY dice_ppm DESC, n DESC, w1, w2 LIMIT 100""".stripMargin,

    // the Wav.synthetic closed forms recomputed without touching bytes:
    // n = 64 + id%33 samples, sample(i) = (id*31 + i*7919) % 65536 - 32768
    // — the Spark side must parse the real RIFF container and scan its
    // PCM frames to land on the same integers
    "q153_audio_pcm" ->
      """WITH ids AS (SELECT doc_id, 64 + doc_id % 33 AS n
        |   FROM documents WHERE doc_id % 4 = 0),
        | samp AS (SELECT doc_id, n,
        |    unnest(generate_series(0, n - 1)) AS i FROM ids),
        | v AS (SELECT doc_id,
        |    (doc_id*31 + i*7919) % 65536 - 32768 AS s FROM samp)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(sum(s * s) AS BIGINT) AS sum_sq,
        | CAST(max(abs(s)) AS BIGINT) AS peak_abs
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // every CMS counter cell rebuilt as a bucket sum under the shared
    // md5-32 hash family, then the same min over the 4 depth rows — the
    // sketch is value-gated bit-for-bit, not just property-checked
    "q154_cms_counts" ->
      """WITH k AS (SELECT CAST(user_id AS VARCHAR) AS user_key, count(*) AS n
        |   FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        | rws AS (SELECT unnest(generate_series(0, 3)) AS r),
        | hb AS (SELECT k.user_key, k.n, rws.r,
        |    ('0x'||substr(md5(CAST(rws.r AS VARCHAR)||':'||k.user_key),1,8))::BIGINT % 64 AS b
        |   FROM k, rws),
        | cell AS (SELECT r, b, sum(n) AS c FROM hb GROUP BY 1, 2),
        | est AS (SELECT hb.user_key, min(cell.c) AS est
        |   FROM hb JOIN cell USING (r, b) GROUP BY 1)
        |SELECT k.user_key, CAST(k.n AS BIGINT) AS exact_n,
        | CAST(est.est AS BIGINT) AS cms_n
        |FROM k JOIN est USING (user_key)
        |ORDER BY user_key""".stripMargin,

    // the same running-max-end sweep in SQL: an interval starts a new
    // island iff its start exceeds the max end of every earlier
    // interval of the key (half-open, so touching intervals merge);
    // ((x % 240) + 240) % 240 is Spark's pmod spelled out
    "q155_interval_union" ->
      """WITH iv AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |    CAST(floor(epoch(ts)) AS BIGINT) + 60 +
        |      ((CAST(floor(value) AS BIGINT) % 240) + 240) % 240 AS e
        |   FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |     AND value IS NOT NULL),
        | o AS (SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |   FROM iv),
        | f AS (SELECT user_id, s, e,
        |    CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni FROM o),
        | g AS (SELECT user_id, s, e,
        |    sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid FROM f),
        | isl AS (SELECT user_id, gid, min(s) AS ss, max(e) AS ee
        |   FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        | CAST(sum(ee - ss) AS BIGINT) AS covered_sec
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,

    // baskets, marginals and the pair self-join rebuilt in SQL; TRY_CAST
    // mirrors Spark's null-on-unparseable cast; // on positive counts ≡
    // Spark DIV
    "q156_basket_rules" ->
      """WITH bi AS (SELECT DISTINCT
        |    user_id * 1000000 + CAST(floor(epoch(ts) / 86400) AS BIGINT) AS b,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS item
        |   FROM events
        |   WHERE user_id IS NOT NULL AND ts IS NOT NULL AND props IS NOT NULL
        |     AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
        | tot AS (SELECT count(DISTINCT b) AS n_baskets FROM bi),
        | m AS (SELECT item, count(*) AS n FROM bi GROUP BY 1),
        | p AS (SELECT x.item AS item_a, y.item AS item_b, count(*) AS n_ab
        |   FROM bi x JOIN bi y ON x.b = y.b AND x.item < y.item
        |   GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.item_a, p.item_b, CAST(p.n_ab AS BIGINT) AS n_ab,
        | CAST(ma.n AS BIGINT) AS n_a, CAST(mb.n AS BIGINT) AS n_b,
        | CAST((p.n_ab * 1000000) // tot.n_baskets AS BIGINT) AS support_ppm,
        | CAST((p.n_ab * 1000000) // ma.n AS BIGINT) AS conf_ab_ppm,
        | CAST((p.n_ab * 1000000) // mb.n AS BIGINT) AS conf_ba_ppm
        |FROM p JOIN m ma ON ma.item = p.item_a
        |  JOIN m mb ON mb.item = p.item_b, tot
        |ORDER BY item_a, item_b""".stripMargin,

    // the lead-window holding segments and the portable floor division
    // ((x - pmod) DIV span ≡ //) replayed per user
    "q157_time_weighted_avg" ->
      """WITH o AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    CAST(floor(value * 1000) AS BIGINT) AS v, event_id FROM events
        |   WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        | seg AS (SELECT user_id, t, v,
        |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS nt FROM o),
        | agg AS (SELECT user_id, count(*) AS n_obs,
        |    sum(CASE WHEN nt IS NULL THEN 0 ELSE nt - t END) AS span,
        |    sum(CASE WHEN nt IS NULL THEN 0 ELSE v * (nt - t) END) AS wv
        |   FROM seg GROUP BY 1)
        |SELECT user_id, CAST(n_obs AS BIGINT) AS n_obs,
        | CAST(span AS BIGINT) AS span_sec,
        | CAST(wv // span AS BIGINT) AS twa_millis
        |FROM agg WHERE span > 0 ORDER BY user_id""".stripMargin,

    // the per-user lead window (event_id tie-break) and the q89
    // conditional-ppm convention replayed in SQL
    "q158_transition_matrix" ->
      """WITH o AS (SELECT user_id, ts, event_type, event_id FROM events
        |   WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        | tr AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |   FROM o),
        | c AS (SELECT from_type, to_type, count(*) AS n FROM tr
        |   WHERE to_type IS NOT NULL GROUP BY 1, 2),
        | h AS (SELECT from_type, sum(n) AS nh FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
        | CAST((c.n * 1000000) // h.nh AS BIGINT) AS cond_ppm
        |FROM c JOIN h USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    // q37's exact neighbor ranking, then the majority vote with the
    // smaller-label tie-break — membership and argmax both value-gated
    "q159_knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
         | c AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS cv FROM embeddings),
         | s AS (SELECT qid, vid, $cosExpr AS cos FROM q, c WHERE qid <> vid),
         | r AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk
         |       FROM s),
         | t AS (SELECT r.qid, e.label FROM r JOIN embeddings e ON e.vec_id = r.vid
         |       WHERE r.rk <= 10 AND e.label IS NOT NULL),
         | v AS (SELECT qid, label, count(*) AS votes FROM t GROUP BY 1, 2),
         | p AS (SELECT qid, label, votes,
         |        row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS rn
         |       FROM v)
         |SELECT p.qid, CAST(eq.label AS BIGINT) AS true_label,
         | CAST(p.label AS BIGINT) AS pred_label, CAST(p.votes AS BIGINT) AS votes
         |FROM p JOIN embeddings eq ON eq.vec_id = p.qid
         |WHERE p.rn = 1 ORDER BY p.qid""".stripMargin,

    // q121's full SCD2 rebuild VERBATIM: the maintained dimension
    // (bootstrap + two incremental merges + one replayed batch through
    // the commit-marker protocol) must land on exactly the from-scratch
    // window build over the whole log
    "q160_dimension_sync" ->
      """WITH o AS (SELECT user_id, ts, event_type, event_id,
        |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        | c AS (SELECT user_id, ts, event_type, event_id FROM o
        |   WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        | v AS (SELECT user_id, event_type, ts AS valid_from,
        |   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c)
        |SELECT user_id, event_type, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, valid_from, event_type NULLS FIRST""".stripMargin,

    // all 8 lag taps replayed per row with head renormalization (NULL
    // lag -> its weight drops from the denominator); // floors like the
    // operator's portable (x - pmod) DIV spelling
    "q161_ewma" -> {
      val ws = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)
      val lagDefs = (1 until ws.size)
        .map(k => s"lag(v, $k) OVER w AS v$k").mkString(", ")
      val num = (s"${ws.head} * v" +: (1 until ws.size).map(k =>
        s" + CASE WHEN v$k IS NULL THEN 0 ELSE ${ws(k)} * v$k END")).mkString
      val den = (s"${ws.head}" +: (1 until ws.size).map(k =>
        s" + CASE WHEN v$k IS NULL THEN 0 ELSE ${ws(k)} END")).mkString
      s"""WITH o AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         |    CAST(floor(value * 1000) AS BIGINT) AS v, event_id FROM events
         |   WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
         | l AS (SELECT user_id, t, event_id, v, $lagDefs
         |   FROM o WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         | e AS (SELECT user_id, t, event_id, v,
         |    ($num) AS num, ($den) AS den FROM l)
         |SELECT user_id, t, event_id, CAST(v AS BIGINT) AS v_millis,
         | CAST(num // den AS BIGINT) AS ewma_millis
         |FROM e ORDER BY user_id, t, event_id""".stripMargin
    },

    // per-dimension extremes via generate_series + 1-based list indexing
    // (DuckDB 1.0 has no WITH ORDINALITY), then every cell renormalized
    // — floor over IEEE doubles matches Spark bit-for-bit
    "q162_minmax_normalize" ->
      """WITH g AS (SELECT unnest(generate_series(1, 64)) AS i),
        | s AS (SELECT i, min(embedding[i]::DOUBLE) AS mn,
        |    max(embedding[i]::DOUBLE) AS mx
        |   FROM embeddings, g WHERE embedding IS NOT NULL GROUP BY i)
        |SELECT e.vec_id, CAST(s.i - 1 AS BIGINT) AS pos,
        | CAST(CASE WHEN s.mx = s.mn THEN 0
        |   ELSE floor((e.embedding[s.i]::DOUBLE - s.mn) * 1000000 / (s.mx - s.mn))
        |   END AS BIGINT) AS norm_ppm
        |FROM embeddings e, s WHERE e.embedding IS NOT NULL
        |ORDER BY vec_id, pos""".stripMargin,

    // the ranked top-10 vocabulary (count desc, token asc at ties) then
    // per-document occurrence counts via a LEFT JOIN membership probe
    "q163_oov_rate" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |   FROM documents WHERE text IS NOT NULL),
        | c AS (SELECT tok, count(*) AS n FROM t GROUP BY 1),
        | v AS (SELECT tok FROM c ORDER BY n DESC, tok LIMIT 10),
        | d AS (SELECT t.doc_id, count(*) AS n_tokens,
        |    sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
        |   FROM t LEFT JOIN v ON t.tok = v.tok GROUP BY 1)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(n_oov AS BIGINT) AS n_oov,
        | CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm
        |FROM d ORDER BY doc_id""".stripMargin,

    // the same +1-span equi-width binning ((x-lo)*n // (hi-lo+1) needs
    // no clamp and floors identically on a non-negative numerator),
    // bucket bounds by observation
    "q164_histogram" ->
      """WITH o AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS v
        |   FROM events WHERE value IS NOT NULL),
        | s AS (SELECT min(v) AS lo, max(v) AS hi FROM o),
        | b AS (SELECT CAST(((v - lo) * 20) // (hi - lo + 1) AS BIGINT) AS bucket, v
        |   FROM o, s)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
        | min(v) AS min_v, max(v) AS max_v
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    // the PLAIN count(DISTINCT): the salted two-stage plan must be
    // bit-identical to it — the gate proves losslessness of the split
    "q165_salted_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        |FROM events GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin,

    // the full unrolled 10-bit Morton interleave replayed per row;
    // ((x % m) + m) % m is pmod, floor(value*1000) the shared millis
    "q166_zorder_key" -> {
      val zexpr = graft.ops.ZOrder.zKeySql("a", "b", bits = 10)
      s"""WITH o AS (SELECT event_id,
         |    ((user_id % 1024) + 1024) % 1024 AS a,
         |    ((CAST(floor(value * 1000) AS BIGINT) % 1024) + 1024) % 1024 AS b
         |   FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL)
         |SELECT event_id, CAST($zexpr AS BIGINT) AS zkey
         |FROM o ORDER BY event_id""".stripMargin
    },

    // q37's exact chain and q41's IVF chain rebuilt side by side, then
    // the per-query overlap — the recall metric itself is value-gated
    "q167_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         | c AS (SELECT vec_id AS vid, v AS cv FROM e),
         | xs AS (SELECT qid, vid, $cosExpr AS cos FROM q, c WHERE qid <> vid),
         | xr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk FROM xs),
         | ex AS (SELECT qid, vid FROM xr WHERE rk <= 10),
         | hp AS (SELECT vec_id AS pid, v AS pv,
         |         ('0x'||substr(md5('9:'||CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS hsh FROM e),
         | p AS (SELECT pid, pv, cent_id FROM (
         |        SELECT pid, pv, CAST(row_number() OVER (ORDER BY hsh, pid) AS BIGINT) AS cent_id
         |        FROM hp) WHERE cent_id <= 32),
         | ac AS (SELECT vid, cv, cent_id FROM (
         |        SELECT e.vec_id AS vid, e.v AS cv, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $pivotDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p) WHERE cr = 1),
         | aq AS (SELECT qid, qv, cent_id FROM (
         |        SELECT e.vec_id AS qid, e.v AS qv, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $pivotDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p WHERE e.vec_id < 5) WHERE cr <= 8),
         | sa AS (SELECT qid, vid, $cosExpr AS cos FROM aq JOIN ac USING (cent_id) WHERE qid <> vid),
         | ar AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk FROM sa),
         | ap AS (SELECT qid, vid FROM ar WHERE rk <= 10),
         | j AS (SELECT ex.qid, CASE WHEN ap.vid IS NULL THEN 0 ELSE 1 END AS hit
         |       FROM ex LEFT JOIN ap ON ex.qid = ap.qid AND ex.vid = ap.vid)
         |SELECT qid, CAST(count(*) AS BIGINT) AS n_exact,
         | CAST(sum(hit) AS BIGINT) AS n_hit,
         | CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS recall_ppm
         |FROM j GROUP BY qid ORDER BY qid""".stripMargin,

    // the division-cleared 2-sigma inequality replayed per observation
    // over exact BIGINT sums; // floors the mean like the operator's
    // (x - pmod) DIV spelling
    "q168_seasonal_anomalies" ->
      """WITH o AS (SELECT event_type AS key, CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events
        |   WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        | st AS (SELECT key, hr, count(*) AS n, sum(v) AS s, sum(v*v) AS q
        |   FROM o GROUP BY 1, 2),
        | f AS (SELECT o.key, o.hr, st.n, st.s,
        |    CASE WHEN (st.n*o.v - st.s)*(st.n*o.v - st.s) > 4*(st.n*st.q - st.s*st.s)
        |     THEN 1 ELSE 0 END AS a
        |   FROM o JOIN st USING (key, hr))
        |SELECT key AS event_type, hr, CAST(max(n) AS BIGINT) AS n,
        | CAST(sum(a) AS BIGINT) AS n_anomalies,
        | CAST((max(s) * 1000) // max(n) AS BIGINT) AS mean_micros
        |FROM f GROUP BY 1, 2 ORDER BY event_type, hr""".stripMargin,

    // the two-replace length trick counts vowel runs portably; the
    // Flesch coefficients in milli with doc-as-one-sentence semantics
    "q169_readability" ->
      """WITH o AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(len(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
        |      - len(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT) AS n_groups
        |   FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, n_words, n_groups,
        | CAST((n_groups * 1000000) // n_words AS BIGINT) AS syll_per_word_ppm,
        | CAST(206835 - 1015 * n_words - (84600 * n_groups) // n_words AS BIGINT) AS ease_milli
        |FROM o WHERE n_words > 0 ORDER BY doc_id""".stripMargin,

    // ascending-rank Gini: (2*sum(i*x) - (n+1)*sum(x)) * 1e6 // (n*sum(x));
    // tie order cannot move the sum, so no tie-break pin is needed
    "q170_gini" ->
      """WITH o AS (SELECT source AS key, CAST(n_chars AS BIGINT) AS v,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars) AS i
        |   FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        | g AS (SELECT key, count(*) AS n, sum(v) AS total, sum(i * v) AS iws
        |   FROM o GROUP BY 1)
        |SELECT key AS source, CAST(n AS BIGINT) AS n, CAST(total AS BIGINT) AS total,
        | CAST(((2 * iws - (n + 1) * total) * 1000000) // (n * total) AS BIGINT) AS gini_ppm
        |FROM g WHERE total > 0 ORDER BY source""".stripMargin,

    // q122's filtered-min chain for the completed funnel, then per-day
    // rank percentiles (value at the integer ceil-division rank ⌈n·p⌉,
    // the q57 convention — (n·num + den − 1) // den, never ceil doubles)
    "q171_conversion_latency" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS view_ts FROM events
        |   WHERE event_type = 'view' GROUP BY 1),
        | s2 AS (SELECT e.user_id, min(e.ts) AS click_ts FROM events e
        |   JOIN s1 ON e.user_id = s1.user_id
        |   WHERE e.event_type = 'click' AND e.ts > s1.view_ts GROUP BY 1),
        | s3 AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM events e
        |   JOIN s2 ON e.user_id = s2.user_id
        |   WHERE e.event_type = 'purchase' AND e.ts > s2.click_ts GROUP BY 1),
        | c AS (SELECT s3.user_id,
        |    CAST(floor(epoch(s1.view_ts)) AS BIGINT) // 86400 AS day,
        |    CAST(floor(epoch(s3.purchase_ts)) AS BIGINT)
        |      - CAST(floor(epoch(s1.view_ts)) AS BIGINT) AS lat_sec
        |   FROM s3 JOIN s1 ON s3.user_id = s1.user_id),
        | r AS (SELECT day, lat_sec,
        |    row_number() OVER (PARTITION BY day ORDER BY lat_sec, user_id) AS rn,
        |    count(*) OVER (PARTITION BY day) AS nn FROM c)
        |SELECT day, CAST(max(nn) AS BIGINT) AS n_conv,
        | CAST(max(CASE WHEN rn = (nn + 1) // 2 THEN lat_sec END) AS BIGINT) AS p50_sec,
        | CAST(max(CASE WHEN rn = (nn * 9 + 9) // 10 THEN lat_sec END) AS BIGINT) AS p90_sec,
        | CAST(max(lat_sec) AS BIGINT) AS max_sec
        |FROM r GROUP BY day ORDER BY day""".stripMargin,

    // the identical trailing RANGE frame over epoch seconds
    "q172_peak_rate" ->
      """WITH o AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
        |   FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        | c AS (SELECT user_id, count(*) OVER (PARTITION BY user_id ORDER BY t
        |    RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW) AS c FROM o)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(max(c) AS BIGINT) AS peak
        |FROM c GROUP BY 1 ORDER BY user_id""".stripMargin,

    // every bucket assignment replayed under the portable md5-32
    // partitioner (unsigned 32-bit, so % ≡ pmod); NULL keys -> -1
    "q173_shuffle_balance" ->
      """WITH o AS (SELECT CASE WHEN user_id IS NULL THEN -1
        |    ELSE ('0x'||substr(md5('0:'||CAST(user_id AS VARCHAR)),1,8))::BIGINT % 32
        |    END AS bucket,
        |    CAST(user_id AS VARCHAR) AS k FROM events)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(DISTINCT k) AS BIGINT) AS n_keys
        |FROM o GROUP BY 1 ORDER BY bucket""".stripMargin,

    // both columns' ranked value counts; NULL is a countable value and
    // rank ties pin (n DESC, value ASC NULLS FIRST) like the operator
    "q174_top_values" ->
      """WITH p AS (SELECT 'event_type' AS col_name, CAST(event_type AS VARCHAR) AS value_repr
        |   FROM events
        |  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events),
        | c AS (SELECT col_name, value_repr, count(*) AS n FROM p GROUP BY 1, 2),
        | r AS (SELECT col_name, value_repr, CAST(n AS BIGINT) AS n,
        |    CAST(row_number() OVER (PARTITION BY col_name
        |      ORDER BY n DESC, value_repr NULLS FIRST) AS BIGINT) AS rk FROM c)
        |SELECT col_name, value_repr, n, rk FROM r WHERE rk <= 10
        |ORDER BY col_name, rk""".stripMargin,

    // top-20 coarsened vocabulary (__other bucket), both floor-ppm
    // distributions, and the half-sum of absolute differences
    "q175_source_drift" ->
      """WITH t AS (SELECT source AS key, unnest(string_split(text, ' ')) AS tok
        |   FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        | cv AS (SELECT tok, count(*) AS n FROM t GROUP BY 1),
        | v AS (SELECT tok FROM cv ORDER BY n DESC, tok LIMIT 20),
        | bkt AS (SELECT t.key, CASE WHEN v.tok IS NULL THEN '__other' ELSE t.tok END AS b
        |   FROM t LEFT JOIN v ON t.tok = v.tok),
        | sc AS (SELECT key, b, count(*) AS sn FROM bkt GROUP BY 1, 2),
        | stt AS (SELECT key, sum(sn) AS st FROM sc GROUP BY 1),
        | cc AS (SELECT b, count(*) AS cn FROM bkt GROUP BY 1),
        | ct AS (SELECT sum(cn) AS tot FROM cc),
        | d AS (SELECT stt.key, stt.st,
        |    abs((coalesce(sc.sn, 0) * 1000000) // stt.st
        |      - (cc.cn * 1000000) // ct.tot) AS ad
        |   FROM stt CROSS JOIN cc CROSS JOIN ct
        |   LEFT JOIN sc ON sc.key = stt.key AND sc.b = cc.b)
        |SELECT key AS source, CAST(max(st) AS BIGINT) AS n_tokens,
        | CAST(sum(ad) // 2 AS BIGINT) AS tv_ppm
        |FROM d GROUP BY 1 ORDER BY source""".stripMargin,

    // TPC-H Q21's EXISTS + NOT EXISTS double correlation, with
    // l_returnflag = 'R' standing in for the missing receipt dates
    "q176_sole_problem_supplier" ->
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |   WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |   WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |     AND l3.l_returnflag = 'R')
        |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin,

    // TPC-H Q22's shape with the above-average test division-cleared
    // over DECIMAL (bal*n > sum) and "no recent order" as the anti join;
    // balance totals in BIGINT cents (never DECIMAL output columns)
    "q177_idle_rich_customers" ->
      """WITH t AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS n
        |   FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
        | CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
        |   AS BIGINT) AS total_bal_cents
        |FROM customer, t
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * t.n > t.s
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |   WHERE o.o_custkey = customer.c_custkey
        |     AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    // per-user rollup, global-max recency anchor, three ntile(5)
    // windows with the user-id tie-break, the 3-digit code
    "q178_rfm_segments" -> rfmNtileSql,

    // the histogram-rank twin must reproduce the SAME plain-ntile
    // oracle bit for bit — sharing the text makes drift impossible
    "q320_rfm_hist" -> rfmNtileSql,

    // the distinct-rhs rollup with both witness values; NULL rhs can't
    // witness a contradiction, NULL lhs is its own group
    "q179_fd_violations" ->
      """SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct_rhs,
        | min(event_type) AS rhs_min, max(event_type) AS rhs_max,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM events GROUP BY 1
        |HAVING count(DISTINCT event_type) > 1
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    // rank-pick thresholds at ceil(n*q/4) per type, then every row's
    // exceedance count (+1) — ties share a bucket by construction
    "q180_quantile_buckets" ->
      """WITH o AS (SELECT event_type AS k, CAST(floor(value * 1000) AS BIGINT) AS v
        |   FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        | r AS (SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY k) AS n FROM o),
        | th AS (SELECT k, max(CASE WHEN rn = (n * 1 + 3) // 4 THEN v END) AS t1,
        |    max(CASE WHEN rn = (n * 2 + 3) // 4 THEN v END) AS t2,
        |    max(CASE WHEN rn = (n * 3 + 3) // 4 THEN v END) AS t3
        |   FROM r GROUP BY k)
        |SELECT o.k AS event_type, o.v AS v_millis,
        | CAST(1 + (CASE WHEN o.v > th.t1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN o.v > th.t2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN o.v > th.t3 THEN 1 ELSE 0 END) AS BIGINT) AS bucket
        |FROM o JOIN th ON th.k = o.k
        |ORDER BY event_type, v_millis""".stripMargin,

    // per-key counts joined, exact sum(cntA*cntB) total, top-10 slice
    // with ppm shares
    "q181_join_forecast" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS n
        |   FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        | j AS (SELECT k, n AS n_left, n AS n_right, n * n AS rows_out FROM c),
        | t AS (SELECT sum(rows_out) AS total_rows FROM j),
        | r AS (SELECT k, n_left, n_right, rows_out,
        |    row_number() OVER (ORDER BY rows_out DESC, k) AS rk FROM j)
        |SELECT r.k AS user_key, CAST(n_left AS BIGINT) AS n_left,
        | CAST(n_right AS BIGINT) AS n_right, CAST(rows_out AS BIGINT) AS rows_out,
        | CAST(rk AS BIGINT) AS rk, CAST(t.total_rows AS BIGINT) AS total_rows,
        | CAST((rows_out * 1000000) // t.total_rows AS BIGINT) AS share_ppm
        |FROM r, t WHERE rk <= 10 ORDER BY rk""".stripMargin,

    // every counter recomputed with list functions; zero-counts BIND
    // (a wrong-dim or NaN row would break the hash)
    "q182_vector_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        | CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) <> 64
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
        | CAST(sum(CASE WHEN embedding IS NOT NULL AND
        |   list_sum(list_transform(embedding::DOUBLE[], x -> x*x)) = 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        | CAST(sum(CASE WHEN embedding IS NOT NULL AND
        |   len(list_filter(embedding::DOUBLE[], x -> isnan(x) OR isinf(x))) > 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite
        |FROM embeddings ORDER BY n_rows""".stripMargin,

    // the lag window (event_id tie-break), gap filter, and q57-style
    // rank-percentile picks per type
    "q183_interarrival" ->
      """WITH o AS (SELECT event_type AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    event_id FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        | g0 AS (SELECT k, t - lag(t) OVER (PARTITION BY k ORDER BY t, event_id) AS g
        |   FROM o),
        | g AS (SELECT k, g FROM g0 WHERE g IS NOT NULL),
        | r AS (SELECT k, g, row_number() OVER (PARTITION BY k ORDER BY g) AS rn,
        |    count(*) OVER (PARTITION BY k) AS n FROM g)
        |SELECT k AS event_type, CAST(max(n) AS BIGINT) AS n_gaps,
        | CAST(max(CASE WHEN rn = (n + 1) // 2 THEN g END) AS BIGINT) AS p50_gap_sec,
        | CAST(max(CASE WHEN rn = (n * 9 + 9) // 10 THEN g END) AS BIGINT) AS p90_gap_sec,
        | CAST(max(g) AS BIGINT) AS max_gap_sec
        |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin,

    // distinct (source, trigram) pairs, shingle spread counts, unique
    // share in ppm
    "q184_source_novelty" ->
      s"""WITH d AS (SELECT source AS key, string_split(text, ' ') AS l
         |   FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         | sh0 AS (SELECT key, unnest($trigrams) AS sh FROM d),
         | sh AS (SELECT DISTINCT key, sh FROM sh0),
         | sp AS (SELECT sh, count(*) AS nk FROM sh GROUP BY 1)
         |SELECT key AS source, CAST(count(*) AS BIGINT) AS n_distinct,
         | CAST(sum(CASE WHEN sp.nk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         | CAST(sum(CASE WHEN sp.nk = 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS unique_ppm
         |FROM sh JOIN sp USING (sh) GROUP BY 1 ORDER BY source""".stripMargin,

    // per-customer cent sums, descending cumsum with the id tie-break,
    // integer threshold tests (2*cum >= total; 10*cum >= 9*total)
    "q185_pareto" ->
      """WITH per AS (SELECT o_custkey AS e,
        |    sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS tv
        |   FROM orders WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
        |   GROUP BY 1),
        | t AS (SELECT sum(tv) AS total FROM per),
        | r AS (SELECT e, tv,
        |    sum(tv) OVER (ORDER BY tv DESC, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    row_number() OVER (ORDER BY tv DESC, e) AS rk FROM per)
        |SELECT CAST(count(*) AS BIGINT) AS n_entities,
        | CAST(max(t.total) AS BIGINT) AS total,
        | CAST(min(CASE WHEN cum * 2 >= t.total THEN rk END) AS BIGINT) AS n_for_half,
        | CAST(min(CASE WHEN cum * 10 >= t.total * 9 THEN rk END) AS BIGINT) AS n_for_90
        |FROM r, t ORDER BY n_entities""".stripMargin,

    // each FK's anti join and counters replayed; 0 orphans BINDS
    "q186_fk_audit" ->
      """WITH a AS (SELECT 'lineitem.order' AS fk_name,
        |    CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_fk,
        |    CAST(sum(CASE WHEN l_orderkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |   FROM lineitem l),
        | b AS (SELECT 'orders.customer',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN o_custkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |      THEN 1 ELSE 0 END) AS BIGINT)
        |   FROM orders o),
        | c AS (SELECT 'customer.nation',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(CASE WHEN c_nationkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_nationkey = cu.c_nationkey)
        |      THEN 1 ELSE 0 END) AS BIGINT)
        |   FROM customer cu)
        |SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c
        |ORDER BY fk_name""".stripMargin,

    // the day keying and every per-column null counter replayed; rows
    // without a timestamp have no day on either side
    "q187_null_rates" ->
      """WITH d AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    value, user_id, props FROM events WHERE ts IS NOT NULL),
        | g AS (SELECT day, count(*) AS n_rows,
        |    sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nv,
        |    sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nu,
        |    sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS np
        |   FROM d GROUP BY 1),
        | l AS (SELECT day, 'value' AS col_name, n_rows, nv AS n_nulls FROM g
        |  UNION ALL SELECT day, 'user_id', n_rows, nu FROM g
        |  UNION ALL SELECT day, 'props', n_rows, np FROM g)
        |SELECT day, col_name, CAST(n_rows AS BIGINT) AS n_rows,
        | CAST(n_nulls AS BIGINT) AS n_nulls,
        | CAST(n_nulls * 1000000 // n_rows AS BIGINT) AS null_ppm
        |FROM l ORDER BY day, col_name""".stripMargin,

    // the banded candidates (minhashCtes' px) verified by EXACT trigram
    // Jaccard, summarized to the one precision row
    "q188_lsh_precision" ->
      s"""WITH $minhashCtes,
         | sz AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
         | iv AS (SELECT p.id_a, p.id_b, count(*) AS inter
         |   FROM px p JOIN sh x ON x.id = p.id_a
         |   JOIN sh y ON y.id = p.id_b AND y.sh = x.sh
         |   GROUP BY 1, 2),
         | jc AS (SELECT px.id_a, px.id_b,
         |    coalesce(iv.inter, 0) * 1000000
         |      // (sa.n + sb.n - coalesce(iv.inter, 0)) AS jac
         |   FROM px LEFT JOIN iv USING (id_a, id_b)
         |   JOIN sz sa ON sa.id = px.id_a JOIN sz sb ON sb.id = px.id_b)
         |SELECT CAST(count(*) AS BIGINT) AS n_candidates,
         | CAST(coalesce(sum(CASE WHEN jac >= 500000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_true,
         | CAST(CASE WHEN count(*) > 0
         |   THEN coalesce(sum(CASE WHEN jac >= 500000 THEN 1 ELSE 0 END), 0) * 1000000 // count(*)
         |   ELSE 0 END AS BIGINT) AS precision_ppm
         |FROM jc ORDER BY n_candidates""".stripMargin,

    // q35's hashed-shingle machinery with the LEAST (containment)
    // denominator and both set sizes carried for the keep policy
    "q189_containment_pairs" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
         | sh AS (SELECT doc_id AS id, unnest($trigrams) AS sh FROM d),
         | hb AS (SELECT id, ('0x'||substr(md5('0:'||sh),1,8))::BIGINT AS h FROM sh),
         | keep AS (SELECT h FROM hb GROUP BY h
         |          HAVING count(*) > 1 AND count(*) <= ${graft.ext.Dedup.DefaultShingleBucketCap}),
         | sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
         | inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
         |           FROM hb a JOIN keep k ON a.h = k.h
         |           JOIN hb b ON a.h = b.h AND a.id < b.id GROUP BY 1,2)
         |SELECT id_a, id_b, CAST(sa.n AS BIGINT) AS na, CAST(sb.n AS BIGINT) AS nb,
         | CAST((inter*1000000) // LEAST(sa.n, sb.n) AS BIGINT) AS containment_ppm
         |FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
         |WHERE inter::DOUBLE / LEAST(sa.n, sb.n) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // cells, totals, integer rate lifts and the tie-broken per-source
    // top-5 replayed
    "q190_distinctive_tokens" ->
      """WITH t AS (SELECT source AS key, unnest(string_split(text, ' ')) AS tok
        |   FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        | sc AS (SELECT key, tok, count(*) AS n FROM t GROUP BY 1, 2),
        | st AS (SELECT key, sum(n) AS st FROM sc GROUP BY 1),
        | cc AS (SELECT tok, sum(n) AS cn FROM sc GROUP BY 1),
        | ct AS (SELECT sum(cn) AS tot FROM cc),
        | r AS (SELECT sc.key, sc.tok,
        |    (sc.n * 1000000) // st.st - (cc.cn * 1000000) // ct.tot AS lift_ppm
        |   FROM sc JOIN st USING (key) JOIN cc USING (tok) CROSS JOIN ct),
        | k AS (SELECT key, tok, lift_ppm,
        |    row_number() OVER (PARTITION BY key ORDER BY lift_ppm DESC, tok) AS rk
        |   FROM r)
        |SELECT key AS source, tok, CAST(lift_ppm AS BIGINT) AS lift_ppm,
        | CAST(rk AS BIGINT) AS rk
        |FROM k WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    // q153's closed forms rolled into 16-sample windows: the Spark side
    // must decode the real RIFF container into the identical series
    "q191_audio_energy" ->
      """WITH ids AS (SELECT doc_id, 64 + doc_id % 33 AS n
        |   FROM documents WHERE doc_id % 4 = 0),
        | samp AS (SELECT doc_id, n,
        |    unnest(generate_series(0, n - 1)) AS i FROM ids),
        | v AS (SELECT doc_id, i // 16 AS win,
        |    (doc_id*31 + i*7919) % 65536 - 32768 AS s FROM samp)
        |SELECT doc_id, CAST(win AS BIGINT) AS win,
        | CAST(count(*) AS BIGINT) AS n_in_win,
        | CAST(sum(s * s) AS BIGINT) AS energy
        |FROM v GROUP BY 1, 2 ORDER BY doc_id, win""".stripMargin,

    // the closed-form winner set of the batch-over-batch protocol:
    // earliest batch holding a fingerprint wins, min doc_id within it
    "q192_incremental_dedup" ->
      """WITH d AS (SELECT doc_id, md5(text) AS fp, doc_id % 3 AS b
        |   FROM documents WHERE text IS NOT NULL),
        | mb AS (SELECT fp, min(b) AS mb FROM d GROUP BY 1),
        | culled AS (SELECT d.doc_id, d.fp, d.b FROM d
        |   JOIN mb ON d.fp = mb.fp AND d.b = mb.mb),
        | keep AS (SELECT fp, min(doc_id) AS keep_id FROM culled GROUP BY 1)
        |SELECT c.doc_id, c.fp FROM culled c
        |JOIN keep k ON c.fp = k.fp AND c.doc_id = k.keep_id
        |ORDER BY doc_id""".stripMargin,

    // the streaming curateAtIngest end state rebuilt from scratch:
    // md5 keep-first dedup (= min doc_id under the protocol's
    // occurrence-rank feed order), q32's stopword langId, q31's integer
    // quality ppm, q64's dup-word gate, q44's PII scrub regexes, q51's
    // split tag, and the synthesized base-epoch + doc_id event seconds
    "q193_curation_ingest" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 17 = 0),
         | k AS (SELECT doc_id, text,
         |    min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
         |   FROM u),
         | sc AS (SELECT doc_id, text, keep_id,
         | $langHitsSql
         |  FROM k),
         | v AS (SELECT doc_id, text, keep_id,
         |   $langCaseSql AS lang_guess,
         |   $qualityPpmSql AS quality_ppm,
         |   ((len(string_split(text,' ')) - len(list_distinct(string_split(text,' '))))
         |     * 1000000) // len(string_split(text,' ')) AS dup_word_ppm,
         |   ('0x'||substr(md5('2:'||doc_id),1,8))::BIGINT % 10000 AS sk
         |  FROM sc),
         | f AS (SELECT * FROM v WHERE doc_id = keep_id AND lang_guess = 'en'
         |   AND quality_ppm >= 500000 AND dup_word_ppm <= 500000)
         |SELECT doc_id,
         | regexp_replace(
         |   regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |   '\\+?[0-9](?:[()\\- ]{0,3}[0-9]){8,14}', '<PHONE>', 'g') AS text,
         | lang_guess, CAST(quality_ppm AS BIGINT) AS quality_ppm,
         | CASE WHEN sk < 9000 THEN 'train' WHEN sk < 9500 THEN 'valid' ELSE 'test' END AS split,
         | CAST(1704067200 + doc_id AS BIGINT) AS event_sec
         |FROM f ORDER BY doc_id""".stripMargin,

    // TPC-H Q2 shape: correlated scalar MIN whose inner query is itself
    // a 4-table join (lineitem is the part<->supplier bridge; the
    // fixtures carry no partsupp)
    "q194_min_cost_supplier" ->
      """SELECT DISTINCT p.p_partkey, s.s_suppkey, s.s_name, n.n_name,
        | l.l_extendedprice AS min_price
        |FROM part p
        |JOIN lineitem l ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'EUROPE' AND p.p_size <= 5
        |  AND l.l_extendedprice = (
        |    SELECT min(l2.l_extendedprice) FROM lineitem l2
        |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY p_partkey, s_suppkey""".stripMargin,

    // TPC-H Q17 shape: two correlated aggregates over the same inner
    // table, threshold division-cleared to 5*n*qty < sum(qty)
    "q195_small_qty_revenue" ->
      """SELECT p.p_brand,
        | CAST(count(*) AS BIGINT) AS n_small,
        | CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |   AS BIGINT) AS revenue_cents
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE CAST(l.l_quantity AS BIGINT) * 5 *
        |      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
        |    < (SELECT CAST(sum(l2.l_quantity) AS BIGINT) FROM lineitem l2
        |       WHERE l2.l_partkey = p.p_partkey)
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,

    // TPC-H Q20 shape: IN over a (part, supplier) rollup filtered by a
    // correlated scalar aggregate on the outer part key (share test
    // integer cross-multiplied: 5*qty > sum(qty) <=> share > 20%)
    "q196_dominant_share_supplier" ->
      """SELECT s.s_suppkey, s.s_name FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT ps.ps_suppkey FROM (
        |    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |      CAST(sum(l_quantity) AS BIGINT) AS ps_qty
        |    FROM lineitem GROUP BY 1, 2) ps
        |  WHERE ps.ps_qty * 5 > (
        |    SELECT CAST(sum(l2.l_quantity) AS BIGINT) FROM lineitem l2
        |    WHERE l2.l_partkey = ps.ps_partkey))
        |ORDER BY s_suppkey""".stripMargin,

    // product-quantization ADC: md5-pivot codebooks (seed 11) sliced
    // into 4 subspaces, integer-micro subspace distances (floored, so
    // sums and argmins are order-independent), per-(vector, subspace)
    // argmin encode, query lookup table, integer ADC sum, rank
    "q197_ann_pq_adc" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        | hp AS (SELECT vec_id AS pid, v AS pv,
        |   ('0x'||substr(md5('11:'||CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS hsh FROM e),
        | cb AS (SELECT pv, cent_id FROM (
        |   SELECT pv, CAST(row_number() OVER (ORDER BY hsh, pid) AS BIGINT) AS cent_id
        |   FROM hp) WHERE cent_id <= 16),
        | sub AS (SELECT unnest(generate_series(0, 3)) AS s),
        | dists AS (SELECT e.vec_id, sub.s, cb.cent_id,
        |   CAST(floor(list_sum(list_transform(
        |     list_zip(e.v[(sub.s*16+1):(sub.s*16+16)], cb.pv[(sub.s*16+1):(sub.s*16+16)]),
        |     x -> (x[1]-x[2])*(x[1]-x[2]))) * 1e6) AS BIGINT) AS dm
        |  FROM e CROSS JOIN sub CROSS JOIN cb),
        | codes AS (SELECT vec_id AS vid, s, cent_id FROM (
        |   SELECT vec_id, s, cent_id,
        |     row_number() OVER (PARTITION BY vec_id, s ORDER BY dm, cent_id) AS r
        |   FROM dists) WHERE r = 1),
        | lut AS (SELECT vec_id AS qid, s, cent_id, dm FROM dists WHERE vec_id < 5),
        | adc AS (SELECT lut.qid, codes.vid, sum(lut.dm) AS adc_micro
        |   FROM codes JOIN lut ON lut.s = codes.s AND lut.cent_id = codes.cent_id
        |   WHERE lut.qid <> codes.vid GROUP BY 1, 2),
        | r AS (SELECT qid, vid, adc_micro,
        |   CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_micro, vid) AS BIGINT) AS "rank"
        |  FROM adc)
        |SELECT qid, vid, CAST(adc_micro AS BIGINT) AS adc_micro, "rank"
        |FROM r WHERE "rank" <= 10 ORDER BY qid, "rank"""".stripMargin,

    // IVF-PQ composed: q41's seed-9 pivot routing (rank-only |p|^2-2vp
    // distances, 32 lists, 8 probes) feeding q197's seed-11 integer ADC
    // rerank over ONLY the routed candidates
    "q198_ann_ivf_pq" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | hi AS (SELECT vec_id AS pid, v AS pv,
         |   ('0x'||substr(md5('9:'||CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS hsh FROM e),
         | p AS (SELECT pid, pv, cent_id FROM (
         |        SELECT pid, pv, CAST(row_number() OVER (ORDER BY hsh, pid) AS BIGINT) AS cent_id
         |        FROM hi) WHERE cent_id <= 32),
         | ac AS (SELECT vid, cent_id FROM (
         |        SELECT e.vec_id AS vid, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $pivotDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p) WHERE cr = 1),
         | aq AS (SELECT qid, cent_id FROM (
         |        SELECT e.vec_id AS qid, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $pivotDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p WHERE e.vec_id < 5) WHERE cr <= 8),
         | cand AS (SELECT aq.qid, ac.vid FROM ac JOIN aq USING (cent_id)
         |          WHERE aq.qid <> ac.vid),
         | hp AS (SELECT vec_id AS pid, v AS pv,
         |   ('0x'||substr(md5('11:'||CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS hsh FROM e),
         | cb AS (SELECT pv, cent_id FROM (
         |   SELECT pv, CAST(row_number() OVER (ORDER BY hsh, pid) AS BIGINT) AS cent_id
         |   FROM hp) WHERE cent_id <= 16),
         | sub AS (SELECT unnest(generate_series(0, 3)) AS s),
         | dists AS (SELECT e.vec_id, sub.s, cb.cent_id,
         |   CAST(floor(list_sum(list_transform(
         |     list_zip(e.v[(sub.s*16+1):(sub.s*16+16)], cb.pv[(sub.s*16+1):(sub.s*16+16)]),
         |     x -> (x[1]-x[2])*(x[1]-x[2]))) * 1e6) AS BIGINT) AS dm
         |  FROM e CROSS JOIN sub CROSS JOIN cb),
         | codes AS (SELECT vec_id AS vid, s, cent_id FROM (
         |   SELECT vec_id, s, cent_id,
         |     row_number() OVER (PARTITION BY vec_id, s ORDER BY dm, cent_id) AS r
         |   FROM dists) WHERE r = 1),
         | lut AS (SELECT vec_id AS qid, s, cent_id, dm FROM dists WHERE vec_id < 5),
         | adc AS (SELECT cand.qid, cand.vid, sum(lut.dm) AS adc_micro
         |   FROM cand JOIN codes ON codes.vid = cand.vid
         |   JOIN lut ON lut.qid = cand.qid AND lut.s = codes.s AND lut.cent_id = codes.cent_id
         |   GROUP BY 1, 2),
         | r AS (SELECT qid, vid, adc_micro,
         |   CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_micro, vid) AS BIGINT) AS "rank"
         |  FROM adc)
         |SELECT qid, vid, CAST(adc_micro AS BIGINT) AS adc_micro, "rank"
         |FROM r WHERE "rank" <= 10 ORDER BY qid, "rank"""".stripMargin,

    // zone-map pruning forecast: both layouts' ntile(64) assignment,
    // per-file min/max zone maps, and the box overlap test replayed;
    // file stats are deterministic under sort ties because ntile sizes
    // are fixed and equal-key rows are interchangeable values
    "q199_zone_map_skipping" -> {
      val zexpr = graft.ops.ZOrder.zKeySql("a", "b", bits = 10)
      s"""WITH o AS (SELECT ((user_id % 1024) + 1024) % 1024 AS a,
         |    ((CAST(floor(value * 1000) AS BIGINT) % 1024) + 1024) % 1024 AS b
         |   FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
         | boxes AS (SELECT 'a_slice' AS box, 0 AS alo, 63 AS ahi, 0 AS blo, 1023 AS bhi
         |   UNION ALL SELECT 'b_slice', 0, 1023, 0, 63),
         | lay AS (SELECT a, b, 'linear' AS layout, (a * 1024 + b) AS k FROM o
         |   UNION ALL SELECT a, b, 'zorder', $zexpr FROM o),
         | tiled AS (SELECT layout, a, b,
         |    ntile(64) OVER (PARTITION BY layout ORDER BY k, a, b) AS f FROM lay),
         | pf AS (SELECT b2.box, t.layout, t.f, count(*) AS n,
         |    min(a) AS mina, max(a) AS maxa, min(b) AS minb, max(b) AS maxb,
         |    sum(CASE WHEN a BETWEEN b2.alo AND b2.ahi AND b BETWEEN b2.blo AND b2.bhi
         |        THEN 1 ELSE 0 END) AS n_match
         |   FROM tiled t CROSS JOIN boxes b2 GROUP BY 1, 2, 3)
         |SELECT box, layout, CAST(count(*) AS BIGINT) AS files_total,
         | CAST(sum(CASE WHEN maxa >= alo AND mina <= ahi AND maxb >= blo AND minb <= bhi
         |     THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
         | CAST(sum(CASE WHEN maxa >= alo AND mina <= ahi AND maxb >= blo AND minb <= bhi
         |     THEN n ELSE 0 END) AS BIGINT) AS rows_read,
         | CAST(sum(n_match) AS BIGINT) AS rows_matched
         |FROM pf JOIN boxes USING (box) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // reliability diagram over deciles: q31's quality formula scored
    // against q32's langId-derived binary label, bin rule and both
    // integral rates replayed
    "q200_calibration" ->
      s"""WITH sc AS (SELECT text,
         | $langHitsSql
         |  FROM documents),
         | v AS (SELECT CAST($qualityPpmSql AS BIGINT) AS s,
         |    CASE WHEN $langCaseSql = 'en' THEN 1 ELSE 0 END AS y
         |   FROM sc),
         | b AS (SELECT (s * 10) // 1000001 AS bin, s, y FROM v)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(s) // count(*) AS BIGINT) AS mean_score_ppm,
         | CAST(sum(y) AS BIGINT) AS n_pos,
         | CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS pos_ppm
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // source-level 5-gram overlap matrix: distinct (source, gram-hash)
    // table, per-source sizes, shared counts from the hash self-join,
    // integer jaccard + containment — q35's hashed-gram convention at
    // source granularity
    "q201_source_overlap" ->
      s"""WITH d AS (SELECT source, string_split(text,' ') AS l FROM documents
         |   WHERE text IS NOT NULL AND source IS NOT NULL),
         | g AS (SELECT DISTINCT source AS k, ('0x'||substr(md5('0:'||sh),1,8))::BIGINT AS h
         |   FROM (SELECT source, unnest(${wordGrams(5)}) AS sh FROM d)),
         | sz AS (SELECT k, count(*) AS n FROM g GROUP BY 1),
         | p AS (SELECT a.k AS s1, b.k AS s2, count(*) AS shared
         |   FROM g a JOIN g b ON a.h = b.h AND a.k < b.k GROUP BY 1, 2)
         |SELECT s1, s2, CAST(shared AS BIGINT) AS shared,
         | CAST(za.n AS BIGINT) AS n1, CAST(zb.n AS BIGINT) AS n2,
         | CAST((shared * 1000000) // (za.n + zb.n - shared) AS BIGINT) AS jaccard_ppm,
         | CAST((shared * 1000000) // least(za.n, zb.n) AS BIGINT) AS containment_ppm
         |FROM p JOIN sz za ON s1 = za.k JOIN sz zb ON s2 = zb.k
         |ORDER BY s1, s2""".stripMargin,

    // three-way layout bake-off: the q199 machinery plus the Hilbert
    // walk replayed as a chained CTE (one step per bit, exactly the
    // operator's column chain)
    "q202_layout_bakeoff" -> {
      val bits = 10
      val zexpr = graft.ops.ZOrder.zKeySql("a", "b", bits)
      val hChain = {
        val steps = (bits - 1) to 0 by -1
        val ctes = scala.collection.mutable.ArrayBuffer(
          "h_in AS (SELECT a, b, a AS hx, b AS hy, CAST(0 AS BIGINT) AS hd FROM o)")
        var prev = "h_in"
        steps.zipWithIndex.foreach { case (i, idx) =>
          ctes += s"h$idx AS (SELECT a, b, ${graft.ops.ZOrder.hilbertStepSql(i, bits)} FROM $prev)"
          prev = s"h$idx"
        }
        (ctes.mkString(",\n "), prev)
      }
      s"""WITH o AS (SELECT ((user_id % 1024) + 1024) % 1024 AS a,
         |    ((CAST(floor(value * 1000) AS BIGINT) % 1024) + 1024) % 1024 AS b
         |   FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
         | ${hChain._1},
         | boxes AS (SELECT 'a_slice' AS box, 0 AS alo, 63 AS ahi, 0 AS blo, 1023 AS bhi
         |   UNION ALL SELECT 'b_slice', 0, 1023, 0, 63),
         | lay AS (SELECT a, b, 'linear' AS layout, (a * 1024 + b) AS k FROM o
         |   UNION ALL SELECT a, b, 'zorder', $zexpr FROM o
         |   UNION ALL SELECT a, b, 'hilbert', hd FROM ${hChain._2}),
         | tiled AS (SELECT layout, a, b,
         |    ntile(64) OVER (PARTITION BY layout ORDER BY k, a, b) AS f FROM lay),
         | pf AS (SELECT b2.box, t.layout, t.f, count(*) AS n,
         |    min(a) AS mina, max(a) AS maxa, min(b) AS minb, max(b) AS maxb,
         |    sum(CASE WHEN a BETWEEN b2.alo AND b2.ahi AND b BETWEEN b2.blo AND b2.bhi
         |        THEN 1 ELSE 0 END) AS n_match
         |   FROM tiled t CROSS JOIN boxes b2 GROUP BY 1, 2, 3)
         |SELECT box, layout, CAST(count(*) AS BIGINT) AS files_total,
         | CAST(sum(CASE WHEN maxa >= alo AND mina <= ahi AND maxb >= blo AND minb <= bhi
         |     THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
         | CAST(sum(CASE WHEN maxa >= alo AND mina <= ahi AND maxb >= blo AND minb <= bhi
         |     THEN n ELSE 0 END) AS BIGINT) AS rows_read,
         | CAST(sum(n_match) AS BIGINT) AS rows_matched
         |FROM pf JOIN boxes USING (box) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // per-type daily OLS trend as an exact rational: the (key, day)
    // rollup, rebased sums (x = day - min day), and both slope legs
    // replayed in HUGEINT then cast
    "q203_trend_slopes" ->
      """WITH d AS (SELECT event_type AS key,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, count(*) AS y
        |   FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |   GROUP BY 1, 2),
        | r AS (SELECT key, count(*) AS n, min(day) AS d0, sum(y) AS sy,
        |    sum(day*y) AS sdy, sum(day) AS sd, sum(day*day) AS sdd
        |   FROM d GROUP BY 1),
        | v AS (SELECT key, n, sy, (sd - n*d0) AS sx,
        |    (sdd - 2*d0*sd + n*d0*d0) AS sxx, (sdy - d0*sy) AS sxy FROM r)
        |SELECT key AS event_type, CAST(n AS BIGINT) AS n_days,
        | CAST(sy AS BIGINT) AS n_events,
        | CAST(CASE WHEN n*sxx - sx*sx > 0 THEN n*sxy - sx*sy ELSE 0 END AS BIGINT) AS slope_num,
        | CAST(CASE WHEN n*sxx - sx*sx > 0 THEN n*sxx - sx*sx ELSE 0 END AS BIGINT) AS slope_den
        |FROM v ORDER BY event_type""".stripMargin,

    // the constraint suite with identical NULL-is-violation semantics:
    // NOT coalesce(pred, FALSE) per counter, one UNION-ALL sheet
    "q204_data_contract" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem),
        | v AS (
        |  SELECT 'discount_range' AS c,
        |   CAST(count(*) FILTER (NOT coalesce(l_discount BETWEEN 0 AND 0.1, FALSE)) AS BIGINT) AS nv FROM lineitem
        |  UNION ALL SELECT 'price_positive',
        |   CAST(count(*) FILTER (NOT coalesce(l_extendedprice > 0, FALSE)) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'qty_le_25',
        |   CAST(count(*) FILTER (NOT coalesce(l_quantity <= 25, FALSE)) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'qty_range',
        |   CAST(count(*) FILTER (NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'returnflag_domain',
        |   CAST(count(*) FILTER (NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'shipdate_not_null',
        |   CAST(count(*) FILTER (l_shipdate IS NULL) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'tax_nonneg',
        |   CAST(count(*) FILTER (NOT coalesce(l_tax >= 0, FALSE)) AS BIGINT) FROM lineitem)
        |SELECT v.c AS "constraint", n.n_rows, v.nv AS n_violations,
        | CAST(CASE WHEN n.n_rows > 0 THEN (v.nv * 1000000) // n.n_rows ELSE 0 END AS BIGINT) AS violation_ppm
        |FROM v CROSS JOIN n ORDER BY 1""".stripMargin,

    // format-roundtrip fidelity: each format row must equal the parquet
    // truth's content fingerprint — the oracle IS the truth side
    "q205_format_roundtrip" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
        |  CAST(sum(epoch_us(ts) % 1000000) AS BIGINT) AS sum_frac_us,
        |  CAST(min(floor(epoch(ts))) AS BIGINT) AS min_sec,
        |  CAST(max(floor(epoch(ts))) AS BIGINT) AS max_sec
        | FROM events)
        |SELECT f.format, a.n_rows, a.n_ids, a.sum_value_milli, a.sum_frac_us,
        | a.min_sec, a.max_sec
        |FROM (SELECT 'csv' AS format UNION ALL SELECT 'json' UNION ALL SELECT 'orc') f
        |CROSS JOIN a ORDER BY 1""".stripMargin,

    // cluster purity over the q41 coarse quantizer: pivot assignment,
    // (cell, label) counts, tie-broken majority, integer purity
    "q206_cluster_purity" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | hp AS (SELECT vec_id AS pid, v AS pv,
         |   ('0x'||substr(md5('9:'||CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS hsh FROM e),
         | p AS (SELECT pid, pv, cent_id FROM (
         |        SELECT pid, pv, CAST(row_number() OVER (ORDER BY hsh, pid) AS BIGINT) AS cent_id
         |        FROM hp) WHERE cent_id <= 32),
         | ac AS (SELECT vid, cent_id FROM (
         |        SELECT e.vec_id AS vid, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $pivotDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p) WHERE cr = 1),
         | lab AS (SELECT vec_id AS vid, CAST(label AS BIGINT) AS lab FROM embeddings
         |   WHERE label IS NOT NULL),
         | cnt AS (SELECT ac.cent_id, lab.lab, count(*) AS c
         |   FROM ac JOIN lab USING (vid) GROUP BY 1, 2),
         | tot AS (SELECT cent_id, sum(c) AS n FROM cnt GROUP BY 1),
         | maj AS (SELECT cent_id, lab, c FROM (
         |   SELECT cent_id, lab, c,
         |     row_number() OVER (PARTITION BY cent_id ORDER BY c DESC, lab) AS r
         |   FROM cnt) WHERE r = 1)
         |SELECT m.cent_id, CAST(t.n AS BIGINT) AS n,
         | CAST(m.lab AS BIGINT) AS majority_label, CAST(m.c AS BIGINT) AS n_majority,
         | CAST((m.c * 1000000) // t.n AS BIGINT) AS purity_ppm
         |FROM maj m JOIN tot t USING (cent_id) ORDER BY cent_id""".stripMargin,

    // Mirrors graft.ext.Png.syntheticNoise + functions.ImageDHash: only
    // the 72 SAMPLED pixels (gx*w//9, gy*h//8) determine the hash, so the
    // oracle replays exactly those from the generator's closed form —
    // per-pixel md5 gray, variant flips, horizontal strictly-brighter
    // bits packed at 8*gy+gx (q102's HUGEINT wrap for bit 63)
    "q207_image_dhash" -> {
      val powers = (0 until 64).map(i => BigInt(1) << i).mkString("[", ",", "]")
      s"""WITH d AS (SELECT doc_id, doc_id // 5 AS pk, doc_id % 5 AS vr,
         |    16 + (doc_id // 5) % 9 AS w, 16 + (doc_id // 5) % 7 AS h
         |   FROM documents WHERE doc_id % 5 < 3),
         | gxs AS (SELECT *, unnest(generate_series(0, 8)) AS gx FROM d),
         | grid AS (SELECT *, unnest(generate_series(0, 7)) AS gy FROM gxs),
         | px AS (SELECT doc_id, vr, pk, gx, gy,
         |    (gx * w) // 9 AS sx, (gy * h) // 8 AS sy FROM grid),
         | g AS (SELECT doc_id, gx, gy,
         |    CASE WHEN vr != 0 AND (31 * sx + 17 * sy)
         |           % (CASE WHEN vr = 1 THEN 29 ELSE 5 END) = 0
         |      THEN ((('0x'||substr(md5(pk||':'||sx||':'||sy),1,8))::BIGINT % 256) + 128) % 256
         |      ELSE ('0x'||substr(md5(pk||':'||sx||':'||sy),1,8))::BIGINT % 256 END AS gv
         |   FROM px),
         | bits AS (SELECT doc_id, gx, gy, gv,
         |    lead(gv) OVER (PARTITION BY doc_id, gy ORDER BY gx) AS nxt FROM g),
         | uv AS (SELECT doc_id,
         |    sum(CASE WHEN nxt > gv THEN ($powers)[8 * gy + gx + 1] ELSE 0 END) AS v
         |   FROM bits WHERE gx < 8 GROUP BY 1)
         |SELECT doc_id, CAST(CASE WHEN v >= 9223372036854775808
         |  THEN v - 18446744073709551616 ELSE v END AS BIGINT) AS dhash
         |FROM uv ORDER BY doc_id""".stripMargin
    },

    // the blocking CONTRACT as the gate: at maxHamming=3 the 4x16
    // pigeonhole makes banding lossless, so banded engine output must
    // equal brute-force all-pairs Hamming over the same closed-form
    // hashes (q207's CTEs verbatim)
    "q208_image_neardup" -> {
      val powers = (0 until 64).map(i => BigInt(1) << i).mkString("[", ",", "]")
      s"""WITH d AS (SELECT doc_id, doc_id // 5 AS pk, doc_id % 5 AS vr,
         |    16 + (doc_id // 5) % 9 AS w, 16 + (doc_id // 5) % 7 AS h
         |   FROM documents WHERE doc_id % 5 < 3),
         | gxs AS (SELECT *, unnest(generate_series(0, 8)) AS gx FROM d),
         | grid AS (SELECT *, unnest(generate_series(0, 7)) AS gy FROM gxs),
         | px AS (SELECT doc_id, vr, pk, gx, gy,
         |    (gx * w) // 9 AS sx, (gy * h) // 8 AS sy FROM grid),
         | g AS (SELECT doc_id, gx, gy,
         |    CASE WHEN vr != 0 AND (31 * sx + 17 * sy)
         |           % (CASE WHEN vr = 1 THEN 29 ELSE 5 END) = 0
         |      THEN ((('0x'||substr(md5(pk||':'||sx||':'||sy),1,8))::BIGINT % 256) + 128) % 256
         |      ELSE ('0x'||substr(md5(pk||':'||sx||':'||sy),1,8))::BIGINT % 256 END AS gv
         |   FROM px),
         | bits AS (SELECT doc_id, gx, gy, gv,
         |    lead(gv) OVER (PARTITION BY doc_id, gy ORDER BY gx) AS nxt FROM g),
         | uv AS (SELECT doc_id,
         |    sum(CASE WHEN nxt > gv THEN ($powers)[8 * gy + gx + 1] ELSE 0 END) AS v
         |   FROM bits WHERE gx < 8 GROUP BY 1),
         | hv AS (SELECT doc_id, CAST(CASE WHEN v >= 9223372036854775808
         |    THEN v - 18446744073709551616 ELSE v END AS BIGINT) AS dhash FROM uv)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
         |FROM hv a JOIN hv b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin
    },

    // independent window formulation of the 2-D skyline staircase:
    // per-price best size, prefix max over cheaper prices, membership
    // join keeps ties/duplicate points (no strict edge = not dominated)
    "q209_skyline" ->
      """WITH p AS (SELECT p_partkey,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
        |    CAST(p_size AS BIGINT) AS p_size FROM part),
        | d AS (SELECT price_cents, max(p_size) AS bg FROM p GROUP BY 1),
        | s AS (SELECT price_cents, bg, max(bg) OVER (ORDER BY price_cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb FROM d),
        | k AS (SELECT price_cents, bg FROM s WHERE pb IS NULL OR bg > pb)
        |SELECT p.p_partkey, p.price_cents, p.p_size
        |FROM p JOIN k ON p.price_cents = k.price_cents AND p.p_size = k.bg
        |ORDER BY p_partkey""".stripMargin,

    // Page's CUSUM via the closed form s_i = C_i - min(0, min_j C_j):
    // the same two stacked windows over n-scaled integer deviations
    // (slack 20, threshold 300 inlined — the operator call's constants)
    "q210_cusum_drift" ->
      """WITH e AS (SELECT event_type AS key, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |    event_id AS seq, CAST(floor(value) AS BIGINT) AS x
        |   FROM events
        |   WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        | st AS (SELECT *, count(*) OVER (PARTITION BY key) AS n,
        |    sum(x) OVER (PARTITION BY key) AS sx FROM e),
        | c AS (SELECT *, sum(n * x - sx - 20 * n) OVER (PARTITION BY key
        |    ORDER BY ts_sec, seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
        |   FROM st),
        | m AS (SELECT *, least(0, min(cc) OVER (PARTITION BY key ORDER BY ts_sec, seq
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS rm FROM c)
        |SELECT key, ts_sec, seq, x, CAST(cc - rm AS BIGINT) AS cusum_nx,
        |  CAST(n AS BIGINT) AS n, (cc - rm) > 300 * n AS is_drift
        |FROM m ORDER BY key, ts_sec, seq""".stripMargin,

    // DECIMAL-cents leading digit via string rendering (no log10, no
    // double x100); expected shares are the same inlined
    // floor(log10(1+1/d)*1e6) constants the operator carries
    "q211_benford" ->
      """WITH v AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |   FROM orders WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 0),
        | d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    count(*) AS n FROM v GROUP BY 1),
        | t AS (SELECT sum(n) AS tot FROM d),
        | x AS (SELECT digit, CAST(v AS BIGINT) AS exp_ppm FROM (VALUES
        |    (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
        |    (6, 66946), (7, 57991), (8, 51152), (9, 45757)) AS ev(digit, v))
        |SELECT d.digit, CAST(d.n AS BIGINT) AS n,
        |  CAST((d.n * 1000000) // t.tot AS BIGINT) AS obs_ppm, x.exp_ppm,
        |  CAST((d.n * 1000000) // t.tot - x.exp_ppm AS BIGINT) AS dev_ppm
        |FROM d JOIN x ON d.digit = x.digit CROSS JOIN t
        |ORDER BY d.digit""".stripMargin,

    // replay the injected damage (mojibake / U+FFFD / C0 controls by
    // doc_id mod 7 — codepoints via chr(), all BMP so both engines'
    // length() agree), then the same two-replace length counts and the
    // same explicit-range C0 class regex (RE2-safe)
    "q212_encoding_audit" ->
      """WITH dmg AS (SELECT doc_id AS id,
        |   CASE WHEN doc_id % 7 = 1 THEN text || ' caf' || chr(195) || chr(169)
        |          || ' na' || chr(195) || chr(175) || 've'
        |        WHEN doc_id % 7 = 2 THEN text || repeat(chr(65533), doc_id % 3 + 1)
        |        WHEN doc_id % 7 = 3 THEN text || chr(7) || chr(27)
        |        ELSE text END AS t FROM documents WHERE text IS NOT NULL),
        | a AS (SELECT id,
        |   CAST(length(t) - length(replace(t, chr(65533), '')) AS BIGINT) AS n_replacement,
        |   CAST(length(t) - length(regexp_replace(t,
        |     '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS BIGINT) AS n_control,
        |   CAST(length(t) - length(replace(t, chr(195), '')) AS BIGINT) AS n_mojibake
        |  FROM dmg)
        |SELECT id, n_replacement, n_control, n_mojibake,
        |  CASE WHEN n_replacement = 0 AND n_control = 0 AND n_mojibake = 0
        |    THEN 'clean' ELSE 'suspect' END AS verdict
        |FROM a ORDER BY id""".stripMargin,

    // two native ASOF JOINs (the q27 pairing) over the same derived
    // feature tables: per-second max for raw values, end-of-day
    // availability for the daily counts — inclusive <= on both engines
    "q213_pit_features" ->
      """WITH ev AS (SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(floor(value) AS BIGINT) AS v
        |   FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        | raw AS (SELECT k, sec AS f_sec, max(v) AS last_val FROM ev GROUP BY 1, 2),
        | dd AS (SELECT k, sec // 86400 AS day, count(*) AS day_n FROM ev GROUP BY 1, 2),
        | daily AS (SELECT k, (day + 1) * 86400 AS avail_sec, day_n FROM dd),
        | o AS (SELECT o_orderkey, o_custkey,
        |    CAST(floor(epoch(o_orderdate)) AS BIGINT) AS t_sec FROM orders),
        | j1 AS (SELECT o.o_orderkey, o.o_custkey, o.t_sec, r.last_val
        |   FROM o ASOF LEFT JOIN raw r
        |     ON o.o_custkey = r.k AND o.t_sec >= r.f_sec),
        | j2 AS (SELECT j1.o_orderkey, j1.o_custkey, j1.t_sec, j1.last_val, d.day_n
        |   FROM j1 ASOF LEFT JOIN daily d
        |     ON j1.o_custkey = d.k AND j1.t_sec >= d.avail_sec)
        |SELECT o_orderkey, o_custkey, t_sec, last_val, day_n
        |FROM j2 ORDER BY o_orderkey""".stripMargin,

    // the full candidate pipeline replayed: dense item index, the
    // k*oversample=12 hash candidates per user (seed base 11), positive
    // anti-join, min-j collision dedup, rank cut at k=3
    "q214_negative_samples" ->
      """WITH pos AS (SELECT DISTINCT o_custkey AS usr, l_partkey AS item
        |   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |   WHERE o_custkey % 50 = 0),
        | items AS (SELECT item, row_number() OVER (ORDER BY item) - 1 AS idx
        |   FROM (SELECT DISTINCT item FROM pos)),
        | u AS (SELECT count(*) AS uu FROM items),
        | cand AS (SELECT usr, j,
        |    ('0x'||substr(md5((11000 + j)||':'||usr),1,8))::BIGINT % uu AS idx
        |   FROM (SELECT DISTINCT usr FROM pos)
        |   CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS j) g
        |   CROSS JOIN u),
        | mapped AS (SELECT usr, item, j FROM cand JOIN items USING (idx)),
        | neg AS (SELECT m.usr, m.item, min(m.j) AS mj FROM mapped m
        |   LEFT JOIN pos p ON m.usr = p.usr AND m.item = p.item
        |   WHERE p.usr IS NULL GROUP BY 1, 2),
        | rk AS (SELECT usr, item,
        |    row_number() OVER (PARTITION BY usr ORDER BY mj, item) AS rnk FROM neg)
        |SELECT usr AS "user", item, CAST(rnk AS BIGINT) AS rank
        |FROM rk WHERE rnk <= 3 ORDER BY usr, rank""".stripMargin,

    // q118's FastSS replay split across the two corpora (baseline vs
    // injected re-crawl); md5 signatures vs the engine's xxhash64 —
    // collision-only divergence, removed by the shared verify predicate
    "q215_record_linkage" ->
      """WITH a AS (SELECT doc_id AS id, text FROM documents WHERE text IS NOT NULL),
        | b AS (SELECT doc_id + 10000000 AS id, text || ' rev' AS text
        |   FROM documents WHERE doc_id % 3 = 0 AND text IS NOT NULL),
        | ta AS (SELECT id, text, string_split(text,' ') AS l FROM a),
        | tb AS (SELECT id, text, string_split(text,' ') AS l FROM b),
        | sa AS (SELECT id, unnest(list_distinct(list_concat([md5(text)],
        |     list_transform(generate_series(1, len(l)), i ->
        |       md5(array_to_string(list_concat(l[1:i-1], l[i+1:len(l)]), ' '))))))
        |     AS sig FROM ta),
        | sb AS (SELECT id, unnest(list_distinct(list_concat([md5(text)],
        |     list_transform(generate_series(1, len(l)), i ->
        |       md5(array_to_string(list_concat(l[1:i-1], l[i+1:len(l)]), ' '))))))
        |     AS sig FROM tb),
        | px AS (SELECT DISTINCT sa.id AS id_a, sb.id AS id_b
        |   FROM sa JOIN sb ON sa.sig = sb.sig),
        | v AS (SELECT id_a, id_b,
        |     CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist
        |   FROM px JOIN a da ON px.id_a = da.id JOIN b db ON px.id_b = db.id)
        |SELECT id_a, id_b, dist FROM v WHERE dist <= 10
        |ORDER BY id_a, id_b""".stripMargin,

    // frozen reference grid, Laplace-smoothed ppm shares, micro-PSI as
    // floor((p-q) * (ln p - ln q)) over the INTEGER ppms — the bigram-LM
    // double-ln precedent
    "q216_psi_drift" ->
      """WITH r AS (SELECT CAST(floor(value) AS BIGINT) AS x FROM events
        |   WHERE value IS NOT NULL AND event_type = 'view'),
        | c AS (SELECT CAST(floor(value) AS BIGINT) AS x FROM events
        |   WHERE value IS NOT NULL AND event_type = 'purchase'),
        | rg AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS nr FROM r),
        | ct AS (SELECT count(*) AS nc FROM c),
        | grid AS (SELECT unnest(generate_series(0, 9)) AS bin, lo, hi, nr FROM rg),
        | br AS (SELECT least(9, greatest(0, ((x - lo) * 10) // (hi - lo + 1))) AS bin,
        |    count(*) AS n_ref FROM r CROSS JOIN rg GROUP BY 1),
        | bc AS (SELECT least(9, greatest(0, ((x - lo) * 10) // (hi - lo + 1))) AS bin,
        |    count(*) AS n_cur FROM c CROSS JOIN rg GROUP BY 1),
        | j AS (SELECT g.bin, g.lo + (g.bin * (g.hi - g.lo + 1)) // 10 AS bin_lo,
        |    coalesce(br.n_ref, 0) AS n_ref, coalesce(bc.n_cur, 0) AS n_cur,
        |    ((coalesce(br.n_ref, 0) + 1) * 1000000) // (g.nr + 10) AS p_ppm,
        |    ((coalesce(bc.n_cur, 0) + 1) * 1000000) // (ct.nc + 10) AS q_ppm
        |   FROM grid g CROSS JOIN ct
        |   LEFT JOIN br ON g.bin = br.bin LEFT JOIN bc ON g.bin = bc.bin)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(bin_lo AS BIGINT) AS bin_lo,
        |  CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
        |  CAST(p_ppm AS BIGINT) AS p_ppm, CAST(q_ppm AS BIGINT) AS q_ppm,
        |  CAST(floor((p_ppm - q_ppm)::DOUBLE * (ln(p_ppm::DOUBLE) - ln(q_ppm::DOUBLE)))
        |    AS BIGINT) AS psi_micro
        |FROM j ORDER BY bin""".stripMargin,

    // the aggregate view materialized once (CTE), scalar max over it,
    // DECIMAL equality
    "q217_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |     (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT))
        |     AS BIGINT) AS total_revenue_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue_e4
        |FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
        |WHERE r.total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q218_large_volume" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey,
        | CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS BIGINT) AS total_qty
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l2.l_orderkey FROM lineitem l2
        |  GROUP BY l2.l_orderkey
        |  HAVING sum(CAST(l2.l_quantity AS DECIMAL(18,2))) > 250)
        |GROUP BY c.c_custkey, c.c_name, o.o_orderkey
        |ORDER BY c_custkey, o_orderkey""".stripMargin,

    // q210's stacked-window closed form with the fixed target (20) and
    // unscaled value units (slack 20, threshold 5000 inlined)
    "q219_cusum_at" ->
      """WITH e AS (SELECT event_type AS key, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |    event_id AS seq, CAST(floor(value) AS BIGINT) AS x
        |   FROM events
        |   WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        | c AS (SELECT *, sum(x - 20 - 20) OVER (PARTITION BY key
        |    ORDER BY ts_sec, seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
        |   FROM e),
        | m AS (SELECT *, least(0, min(cc) OVER (PARTITION BY key ORDER BY ts_sec, seq
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS rm FROM c)
        |SELECT key, ts_sec, seq, x, CAST(cc - rm AS BIGINT) AS cusum,
        |  (cc - rm) > 5000 AS is_drift
        |FROM m ORDER BY key, ts_sec, seq""".stripMargin,

    // edges from the CLOSED FORM of q65's URL injection (the engine must
    // reproduce them through its real extraction + domain folding), then
    // q124's three unrolled integer PageRank iterations over the
    // source/domain node space
    "q220_domain_authority" ->
      """WITH e AS (
        |  SELECT DISTINCT source AS src,
        |    'example' || (doc_id % 7) || '.com' AS dst FROM documents
        |  UNION
        |  SELECT DISTINCT source, 'assets' || (doc_id % 5) || '.org'
        |  FROM documents WHERE doc_id % 3 = 0),
        | od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
        | nd AS (SELECT DISTINCT src AS node FROM e
        |   UNION SELECT DISTINCT dst FROM e),
        | r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nd),
        | c1 AS (SELECT e.dst AS node, sum(r0.r // od.outdeg) AS s FROM e
        |   JOIN r0 ON e.src = r0.node JOIN od ON e.src = od.src GROUP BY 1),
        | r1 AS (SELECT nd.node,
        |   CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
        |   FROM nd LEFT JOIN c1 USING (node)),
        | c2 AS (SELECT e.dst AS node, sum(r1.r // od.outdeg) AS s FROM e
        |   JOIN r1 ON e.src = r1.node JOIN od ON e.src = od.src GROUP BY 1),
        | r2 AS (SELECT nd.node,
        |   CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
        |   FROM nd LEFT JOIN c2 USING (node)),
        | c3 AS (SELECT e.dst AS node, sum(r2.r // od.outdeg) AS s FROM e
        |   JOIN r2 ON e.src = r2.node JOIN od ON e.src = od.src GROUP BY 1),
        | r3 AS (SELECT nd.node,
        |   CAST(150000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
        |   FROM nd LEFT JOIN c3 USING (node))
        |SELECT node, r AS rank_ppm FROM r3 ORDER BY node""".stripMargin,

    // Q13 distribution: the non-urgent predicate stays in the ON clause
    // so order-less (or urgent-only) customers survive with n_orders=0
    "q221_order_distribution" ->
      """SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
        |FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
        |      FROM customer c LEFT JOIN orders o
        |        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey) t
        |GROUP BY n_orders
        |ORDER BY n_customers DESC, n_orders DESC""".stripMargin,

    // Q11 share test division-cleared and scale-invariant:
    // val * n_suppliers * 20 > total * 21 (above 1.05x the mean share);
    // values as BIGINT 1e-4 lanes, the share test widened to HUGEINT
    // (the DECIMAL(38,0) twin of the operator side)
    "q222_value_share" ->
      """WITH sv AS (SELECT l_suppkey,
        |   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |     CAST(l_quantity AS DECIMAL(18,2)) * 10000 AS BIGINT)) AS BIGINT) AS val_e4
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT l_suppkey, val_e4 FROM sv
        |WHERE CAST(val_e4 AS HUGEINT) * (SELECT count(*) FROM sv) * 20
        |    > (SELECT CAST(sum(val_e4) AS HUGEINT) * 21 FROM sv)
        |ORDER BY l_suppkey""".stripMargin,

    // Q19 disjunctive conjunction groups, rolled up per brand
    "q223_disjunctive_pred" ->
      """SELECT p_brand,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT))
        |   AS BIGINT) AS revenue_e4,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // Q16 count-distinct under a NOT IN exclusion (s_suppkey non-null →
    // plain anti join on both engines)
    "q224_supplier_relationship" ->
      """SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
        |  CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#1'
        |  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l.l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p.p_brand, p.p_type, p.p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // Q3 top-10 open orders; total ORDER BY makes the LIMIT deterministic
    "q225_shipping_priority" ->
      """SELECT l_orderkey,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT))
        |   AS BIGINT) AS revenue_e4,
        | CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_date_sec,
        | o_orderpriority
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        | JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_e4 DESC, order_date_sec, l_orderkey
        |LIMIT 10""".stripMargin,

    // Q7 symmetric two-nation pair, both directions kept as groups
    "q226_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        | CAST(sum(v_e4) AS BIGINT) AS revenue_e4
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |         (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS v_e4
        |      FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        |       JOIN orders o ON o.o_orderkey = l.l_orderkey
        |       JOIN customer c ON c.c_custkey = o.o_custkey
        |       JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |       JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |       JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        |       JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |      WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
        |          OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
        |        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') sh
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    // Q8 market share in integer ppm: BIGINT 1e-4 volume units, HUGEINT
    // floor division twin of the operator's DECIMAL(38,0) DIV
    "q227_market_share" ->
      """WITH vol AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |   n1.n_name AS supp_nation,
        |   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |     (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS v_e4
        |  FROM lineitem l
        |   JOIN part p ON p.p_partkey = l.l_partkey
        |   JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |   JOIN orders o ON o.o_orderkey = l.l_orderkey
        |   JOIN customer c ON c.c_custkey = o.o_custkey
        |   JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |   JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |   JOIN region r ON n2.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD')
        |SELECT o_year,
        | CAST((CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN v_e4 ELSE 0 END)
        |   AS HUGEINT) * 1000000) // sum(v_e4) AS BIGINT) AS share_ppm,
        | CAST(sum(v_e4) AS BIGINT) AS total_e4
        |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,

    // Q10 returned-item reporting, top-20 with a total ORDER BY
    "q228_returned_items" ->
      """SELECT c.c_custkey, c.c_name,
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT))
        |   AS BIGINT) AS revenue_e4,
        | CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_cents,
        | n.n_name
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        | JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue_e4 DESC, c_custkey
        |LIMIT 20""".stripMargin,

    // Q14 promo share in integer ppm over BIGINT 1e-4 volume units
    "q229_promo_revenue" ->
      """WITH v AS (SELECT p_type,
        |   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |     (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS v_e4
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00')
        |SELECT
        | CAST((CAST(sum(CASE WHEN p_type = 'PROMO' THEN v_e4 ELSE 0 END)
        |   AS HUGEINT) * 1000000) // sum(v_e4) AS BIGINT) AS promo_ppm,
        | CAST(sum(v_e4) AS BIGINT) AS total_e4
        |FROM v ORDER BY promo_ppm""".stripMargin,

    // plain (un-binned) range join — the binned operator must agree with
    // the naive O(n*m) formulation exactly; threshold division-cleared
    "q230_binned_range_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        | h AS (SELECT (ts_sec // 3600) * 3600 AS hour_sec,
        |    CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        | t AS (SELECT hour_sec, n, sum(n) OVER () AS total,
        |    count(*) OVER () AS nh FROM h),
        | busy AS (SELECT hour_sec FROM t WHERE n * nh * 10 > total * 12),
        | j AS (SELECT b.hour_sec, e.event_id, e.user_id
        |   FROM busy b JOIN e
        |     ON e.ts_sec >= b.hour_sec AND e.ts_sec < b.hour_sec + 3600
        |   WHERE e.event_type = 'purchase')
        |SELECT hour_sec, CAST(count(*) AS BIGINT) AS n_purchases,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers
        |FROM j GROUP BY hour_sec ORDER BY hour_sec""".stripMargin,

    // from-scratch rebuild the maintained per-user aggregate state:
    // the protocol's three batch drops + crash/retry arms must land
    // exactly here (monoid merge ≡ one-shot aggregate)
    "q231_agg_maintenance" ->
      """SELECT user_id,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(coalesce(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0))
        |   AS BIGINT) AS sum_value_e2,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_purchases,
        | CAST(min(floor(epoch(ts))) AS BIGINT) AS min_ts_sec,
        | CAST(max(floor(epoch(ts))) AS BIGINT) AS max_ts_sec
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // rebuild the v2->v3 change feed from scratch: users touched by
    // drop 2 (event_id % 3 = 2), classified insert/update by whether
    // they existed before, carrying the final (v3) metric values —
    // n_events strictly grows for every touched user, so "touched"
    // coincides with the operator's "any metric differs"
    "q232_agg_changes" ->
      """WITH all_m AS (SELECT user_id,
        |   CAST(count(*) AS BIGINT) AS n_events,
        |   CAST(sum(coalesce(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0))
        |     AS BIGINT) AS sum_value_e2,
        |   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |     AS BIGINT) AS n_purchases,
        |   CAST(min(floor(epoch(ts))) AS BIGINT) AS min_ts_sec,
        |   CAST(max(floor(epoch(ts))) AS BIGINT) AS max_ts_sec
        |  FROM events GROUP BY user_id),
        | old_u AS (SELECT DISTINCT user_id FROM events WHERE event_id % 3 <> 2),
        | new_u AS (SELECT DISTINCT user_id FROM events WHERE event_id % 3 = 2)
        |SELECT a.user_id,
        | CASE WHEN o.user_id IS NULL THEN 'insert' ELSE 'update' END AS op,
        | a.n_events, a.sum_value_e2, a.n_purchases, a.min_ts_sec, a.max_ts_sec
        |FROM all_m a JOIN new_u nu ON a.user_id = nu.user_id
        | LEFT JOIN old_u o ON a.user_id = o.user_id
        |ORDER BY a.user_id""".stripMargin,

    // the PPJoin prefix filter replayed end to end: df table, global
    // (df, hash) order, prefix length n - ceil(7n/10) + 1 in integer
    // ceil division, bucket pairs from prefix shingles only, exact
    // list_intersect verify with the division-cleared threshold
    "q233_jaccard_prefix" ->
      s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
         | sets AS (SELECT doc_id AS id,
         |    list_sort(list_distinct(list_transform($trigrams,
         |      s -> ('0x'||substr(md5('0:'||s),1,8))::BIGINT))) AS hs
         |   FROM d),
         | sized AS (SELECT id, hs, len(hs) AS n FROM sets WHERE len(hs) > 0),
         | sh AS (SELECT id, unnest(hs) AS h FROM sized),
         | df AS (SELECT h, count(*) AS dd FROM sh GROUP BY 1),
         | ranked AS (SELECT id, h,
         |    row_number() OVER (PARTITION BY id ORDER BY dd, h) AS rk
         |   FROM sh JOIN df USING (h)),
         | prefix AS (SELECT r.id, r.h FROM ranked r JOIN sized s ON r.id = s.id
         |   WHERE r.rk <= s.n - (7 * s.n + 9) // 10 + 1),
         | cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |   FROM prefix a JOIN prefix b ON a.h = b.h AND a.id < b.id),
         | v AS (SELECT id_a, id_b,
         |    len(list_intersect(sa.hs, sb.hs)) AS inter, sa.n AS na, sb.n AS nb
         |   FROM cand JOIN sized sa ON id_a = sa.id JOIN sized sb ON id_b = sb.id)
         |SELECT id_a, id_b,
         | CAST((inter * 1000000) // (na + nb - inter) AS BIGINT) AS jaccard_ppm
         |FROM v WHERE inter * 10 >= 7 * (na + nb - inter)
         |ORDER BY id_a, id_b""".stripMargin,

    // the generalization walk replayed: class counts at each of the 4
    // ladder levels, first level whose min class size reaches k=3 wins
    // (fallback: last level). DuckDB 1.0's integer // TRUNCATES toward
    // zero (-5 // 2 = -2), so negative cents need the explicit
    // (x - pmod) floor spelling to match the operator's floor division
    "q234_k_anonymity" ->
      """WITH c AS (SELECT c_mktsegment AS seg,
        |    CAST(c_nationkey AS BIGINT) AS nat,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        | l0 AS (SELECT seg, nat AS geo,
        |    (cents - ((cents % 10000) + 10000) % 10000) // 10000 AS bal,
        |    CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1,2,3),
        | l1 AS (SELECT seg, nat AS geo,
        |    (cents - ((cents % 100000) + 100000) % 100000) // 100000 AS bal,
        |    CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1,2,3),
        | l2 AS (SELECT seg, nat // 5 AS geo,
        |    CASE WHEN cents >= 0 THEN 1 ELSE 0 END AS bal,
        |    CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1,2,3),
        | l3 AS (SELECT seg, CAST(-1 AS BIGINT) AS geo, CAST(0 AS BIGINT) AS bal,
        |    CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1,2,3),
        | pick AS (SELECT CASE
        |    WHEN (SELECT min(n) FROM l0) >= 3 THEN 0
        |    WHEN (SELECT min(n) FROM l1) >= 3 THEN 1
        |    WHEN (SELECT min(n) FROM l2) >= 3 THEN 2
        |    ELSE 3 END AS lvl),
        | u AS (SELECT 0 AS lvl, * FROM l0 UNION ALL
        |       SELECT 1, * FROM l1 UNION ALL
        |       SELECT 2, * FROM l2 UNION ALL
        |       SELECT 3, * FROM l3)
        |SELECT seg, CAST(geo AS BIGINT) AS geo, CAST(bal AS BIGINT) AS bal,
        | n, CAST(lvl AS BIGINT) AS level
        |FROM u WHERE lvl = (SELECT lvl FROM pick)
        |ORDER BY seg, geo, bal""".stripMargin,

    // from-scratch rebuild of the post-retraction state: events that
    // were inserted (drops 0 and 1) and never erased (neither the
    // user_id % 7 GDPR arm nor the event_id % 5 slice); a user whose
    // every inserted event was erased has no group here — exactly the
    // zero-support removal the fold performs
    "q235_retraction_fold" ->
      """SELECT user_id,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(coalesce(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0))
        |   AS BIGINT) AS sum_value_e2,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_purchases
        |FROM events
        |WHERE event_id % 3 <> 2
        |  AND NOT (user_id % 7 = 0 OR event_id % 5 = 0)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // rebuild the v2->v3 (pre/post retraction) change feed: fully
    // erased users are deletes with NULL metrics, partially retracted
    // users are updates carrying v3 values, untouched users filtered;
    // inserts are unreachable (retraction only removes)
    "q236_retraction_changes" ->
      """WITH ins AS (SELECT * FROM events WHERE event_id % 3 <> 2),
        | v2 AS (SELECT user_id,
        |   CAST(count(*) AS BIGINT) AS n_events,
        |   CAST(sum(coalesce(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0))
        |     AS BIGINT) AS sum_value_e2,
        |   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |     AS BIGINT) AS n_purchases
        |  FROM ins GROUP BY user_id),
        | v3 AS (SELECT user_id,
        |   CAST(count(*) AS BIGINT) AS n_events,
        |   CAST(sum(coalesce(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0))
        |     AS BIGINT) AS sum_value_e2,
        |   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |     AS BIGINT) AS n_purchases
        |  FROM ins
        |  WHERE NOT (user_id % 7 = 0 OR event_id % 5 = 0)
        |  GROUP BY user_id)
        |SELECT * FROM (
        | SELECT v2.user_id,
        |  CASE WHEN v3.user_id IS NULL THEN 'delete'
        |       WHEN v2.n_events <> v3.n_events
        |         OR v2.sum_value_e2 <> v3.sum_value_e2
        |         OR v2.n_purchases <> v3.n_purchases THEN 'update' END AS op,
        |  v3.n_events, v3.sum_value_e2, v3.n_purchases
        | FROM v2 LEFT JOIN v3 ON v2.user_id = v3.user_id)
        |WHERE op IS NOT NULL ORDER BY user_id""".stripMargin,

    // the l-diversity walk replayed: class size AND distinct-sensitive
    // counts at each ladder level, first level passing BOTH min tests
    // (k=3 rows, l=3 distinct segments) wins, last-level fallback
    "q237_l_diversity" ->
      """WITH c AS (SELECT c_mktsegment AS seg,
        |    CAST(c_nationkey AS BIGINT) AS nat,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        | l0 AS (SELECT nat AS geo,
        |    (cents - ((cents % 10000) + 10000) % 10000) // 10000 AS bal,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT seg) AS BIGINT) AS n_sensitive
        |   FROM c GROUP BY 1,2),
        | l1 AS (SELECT nat AS geo,
        |    (cents - ((cents % 100000) + 100000) % 100000) // 100000 AS bal,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT seg) AS BIGINT) AS n_sensitive
        |   FROM c GROUP BY 1,2),
        | l2 AS (SELECT nat // 5 AS geo,
        |    CASE WHEN cents >= 0 THEN 1 ELSE 0 END AS bal,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT seg) AS BIGINT) AS n_sensitive
        |   FROM c GROUP BY 1,2),
        | l3 AS (SELECT CAST(-1 AS BIGINT) AS geo, CAST(0 AS BIGINT) AS bal,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT seg) AS BIGINT) AS n_sensitive
        |   FROM c GROUP BY 1,2),
        | pick AS (SELECT CASE
        |    WHEN (SELECT min(least(n, n_sensitive)) FROM l0) >= 3 THEN 0
        |    WHEN (SELECT min(least(n, n_sensitive)) FROM l1) >= 3 THEN 1
        |    WHEN (SELECT min(least(n, n_sensitive)) FROM l2) >= 3 THEN 2
        |    ELSE 3 END AS lvl),
        | u AS (SELECT 0 AS lvl, * FROM l0 UNION ALL
        |       SELECT 1, * FROM l1 UNION ALL
        |       SELECT 2, * FROM l2 UNION ALL
        |       SELECT 3, * FROM l3)
        |SELECT CAST(geo AS BIGINT) AS geo, CAST(bal AS BIGINT) AS bal,
        | n, n_sensitive, CAST(lvl AS BIGINT) AS level
        |FROM u WHERE lvl = (SELECT lvl FROM pick)
        |ORDER BY geo, bal""".stripMargin,

    // restatement rebuilt from the same closed form, then the keyed
    // full-outer diff classified with column-level change lists
    // (concat_ws skips the NULL arms in both engines)
    "q238_table_diff" ->
      """WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS custkey,
        |   CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents,
        |   c_mktsegment AS seg FROM customer),
        | aft AS (
        |  SELECT custkey,
        |    bal_cents + CASE WHEN custkey % 7 = 0 THEN 1000 ELSE 0 END AS bal_cents,
        |    CASE WHEN custkey % 5 = 0 THEN 'MOVED' ELSE seg END AS seg
        |   FROM base WHERE custkey % 11 <> 0
        |  UNION ALL
        |  SELECT custkey + 10000000, bal_cents, seg
        |   FROM base WHERE custkey % 13 = 0),
        | j AS (SELECT coalesce(b.custkey, a.custkey) AS custkey,
        |   CASE WHEN b.custkey IS NULL THEN 'insert'
        |        WHEN a.custkey IS NULL THEN 'delete'
        |        WHEN (b.bal_cents IS DISTINCT FROM a.bal_cents)
        |          OR (b.seg IS DISTINCT FROM a.seg) THEN 'update' END AS op,
        |   CASE WHEN b.custkey IS NOT NULL AND a.custkey IS NOT NULL
        |        AND ((b.bal_cents IS DISTINCT FROM a.bal_cents)
        |          OR (b.seg IS DISTINCT FROM a.seg)) THEN
        |     concat_ws(',',
        |       CASE WHEN b.bal_cents IS DISTINCT FROM a.bal_cents
        |            THEN 'bal_cents' END,
        |       CASE WHEN b.seg IS DISTINCT FROM a.seg THEN 'seg' END)
        |   END AS changed_cols
        |  FROM base b FULL OUTER JOIN aft a ON b.custkey = a.custkey)
        |SELECT custkey, op, changed_cols FROM j
        |WHERE op IS NOT NULL ORDER BY custkey""".stripMargin,

    // quantity-weighted price percentiles: running weight in value
    // order, threshold as the division-cleared 10*cumw >= p*W integer
    // test; tie order inside equal prices cannot move the min
    "q239_weighted_percentiles" ->
      """WITH b AS (SELECT l_returnflag AS flag,
        |   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |   CAST(l_quantity AS BIGINT) AS wt FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND CAST(l_quantity AS BIGINT) > 0),
        | w AS (SELECT flag, v,
        |   sum(wt) OVER (PARTITION BY flag ORDER BY v
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |   sum(wt) OVER (PARTITION BY flag) AS tot FROM b)
        |SELECT flag, CAST(max(tot) AS BIGINT) AS w_total,
        | CAST(min(CASE WHEN cumw * 10 >= tot * 5 THEN v END) AS BIGINT)
        |   AS p50_cents,
        | CAST(min(CASE WHEN cumw * 10 >= tot * 9 THEN v END) AS BIGINT)
        |   AS p90_cents
        |FROM w GROUP BY flag ORDER BY flag""".stripMargin,

    // the rank cut replayed: per-user counts, total (count desc, key
    // asc) order, top 10 kept, the rest folded into one exact
    // __other__ row; HAVING guards the empty-residual case
    "q240_topn_other" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS n_rows FROM events GROUP BY 1),
        | r AS (SELECT key, n_rows,
        |    row_number() OVER (ORDER BY n_rows DESC, key) AS rk FROM c)
        |SELECT key, n_rows, CAST(1 AS BIGINT) AS n_keys
        | FROM r WHERE rk <= 10
        |UNION ALL
        |SELECT '__other__', CAST(sum(n_rows) AS BIGINT),
        |  CAST(count(*) AS BIGINT)
        | FROM r WHERE rk > 10 HAVING count(*) > 0
        |ORDER BY n_rows DESC, key""".stripMargin,

    // the consuming engine recomputes the manifest: same md5 shard
    // assignment, same key-bound uint32 fingerprints, same sums
    "q241_export_manifest" ->
      """WITH f AS (SELECT
        |   ('0x'||substr(md5('0:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 8
        |     AS shard,
        |   ('0x'||substr(md5('1:'||CAST(doc_id AS VARCHAR)||':'||text),1,8))::BIGINT
        |     AS fp
        |  FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(fp) AS BIGINT) AS content_sum
        |FROM f GROUP BY shard ORDER BY shard""".stripMargin,

    // every leave-one-out mean rebuilt as (total - source) over
    // (n_total - n_source); all divisions are floors of non-negative
    // integers, so // is portable here
    "q242_source_ablation" ->
      s"""WITH d AS (SELECT source,
         |   CAST($qualityPpmSql AS BIGINT) AS q,
         |   CAST(len(string_split(text,' ')) AS BIGINT) AS tok
         |  FROM documents),
         | per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |   CAST(sum(tok) AS BIGINT) AS n_tokens,
         |   CAST(sum(q) AS BIGINT) AS sum_q
         |  FROM d GROUP BY source),
         | tot AS (SELECT sum(n_docs) AS t_docs, sum(n_tokens) AS t_tokens,
         |   sum(sum_q) AS t_q FROM per)
         |SELECT source, n_docs, n_tokens,
         | CAST((n_tokens * 1000000) // t_tokens AS BIGINT) AS tok_share_ppm,
         | CAST(sum_q // n_docs AS BIGINT) AS mean_q_ppm,
         | CAST(CASE WHEN t_docs > n_docs
         |   THEN (t_q - sum_q) // (t_docs - n_docs) END AS BIGINT)
         |   AS mean_wo_ppm,
         | CAST(CASE WHEN t_docs > n_docs
         |   THEN t_q // t_docs - (t_q - sum_q) // (t_docs - n_docs) END
         |   AS BIGINT) AS lift_ppm
         |FROM per, tot ORDER BY source""".stripMargin,

    // daily rollup, all ordered pairs, the pmod-floored ppm slope
    // (den > 0; numerator may be negative -> explicit floor spelling),
    // median by the (n+1)//2 rank over the total (slope, d1, d2) order
    "q243_theilsen_slope" ->
      """WITH daily AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | p AS (SELECT a.event_type,
        |   (b.y - a.y) * 1000000 AS num, b.day - a.day AS den,
        |   a.day AS d1, b.day AS d2
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND b.day > a.day),
        | s AS (SELECT event_type, d1, d2,
        |   (num - ((num % den) + den) % den) // den AS slope_ppm FROM p),
        | r AS (SELECT event_type, slope_ppm,
        |   row_number() OVER (PARTITION BY event_type
        |     ORDER BY slope_ppm, d1, d2) AS rn,
        |   count(*) OVER (PARTITION BY event_type) AS n_pairs FROM s)
        |SELECT event_type, CAST(max(n_pairs) AS BIGINT) AS n_pairs,
        | CAST(max(CASE WHEN rn = (n_pairs + 1) // 2 THEN slope_ppm END)
        |   AS BIGINT) AS slope_ppm_median
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the forecast replayed: both count tables (identical here — the
    // accidental self-join), per-key c*c contributions, the total
    // (out desc, key asc) cut, and the exact __total__ row
    "q244_join_fanout" ->
      """WITH lc AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS n_left FROM events GROUP BY 1),
        | rc AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS n_right FROM events GROUP BY 1),
        | m AS (SELECT lc.key, n_left, n_right,
        |    n_left * n_right AS out_rows FROM lc JOIN rc ON lc.key = rc.key),
        | r AS (SELECT key, n_left, n_right, out_rows,
        |    row_number() OVER (ORDER BY out_rows DESC, key) AS rk FROM m)
        |SELECT key, n_left, n_right, out_rows FROM r WHERE rk <= 10
        |UNION ALL
        |SELECT '__total__', CAST(coalesce(sum(n_left), 0) AS BIGINT),
        | CAST(coalesce(sum(n_right), 0) AS BIGINT),
        | CAST(coalesce(sum(out_rows), 0) AS BIGINT) FROM m
        |ORDER BY out_rows DESC, key""".stripMargin,

    // daily rollup, running prefix sums, the HUGEINT-scaled floored
    // micro-gain (A = S_t*n - S*t can square past 2^63), argmax with
    // earliest-split ties
    "q245_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | c AS (SELECT event_type, day,
        |   row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        |   sum(y) OVER (PARTITION BY event_type ORDER BY day
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |   count(*) OVER (PARTITION BY event_type) AS n,
        |   sum(y) OVER (PARTITION BY event_type) AS tot
        |  FROM daily),
        | g AS (SELECT *, cum * n - tot * rn AS a FROM c WHERE rn < n),
        | s AS (SELECT event_type, day, rn, cum, n, tot,
        |   (CAST(a AS HUGEINT) * a * 1000000) // (rn * (n - rn) * n)
        |     AS gain_micro
        |  FROM g),
        | r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |     ORDER BY gain_micro DESC, rn) AS pick FROM s)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        | CAST(day AS BIGINT) AS split_day, CAST(rn AS BIGINT) AS left_n,
        | CAST(cum AS BIGINT) AS left_sum,
        | CAST(tot - cum AS BIGINT) AS right_sum,
        | CAST(gain_micro AS BIGINT) AS gain_micro
        |FROM r WHERE pick = 1 ORDER BY event_type""".stripMargin,

    // anchor on the observed max day, rebuild each fold's window
    // edges, count train/test rows by correlated subquery
    "q246_backtest_folds" ->
      """WITH d AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events WHERE ts IS NOT NULL),
        | mx AS (SELECT max(day) AS dmax FROM d),
        | f AS (SELECT unnest([1, 2, 3]) AS fold),
        | w AS (SELECT fold,
        |   (SELECT dmax FROM mx) - (3 - fold) * 7 - 6 AS lo,
        |   (SELECT dmax FROM mx) - (3 - fold) * 7 AS hi FROM f
        |  WHERE (SELECT dmax FROM mx) IS NOT NULL)
        |SELECT CAST(fold AS BIGINT) AS fold,
        | CAST(lo - 1 AS BIGINT) AS train_end_day,
        | CAST((SELECT count(*) FROM d WHERE d.day < w.lo) AS BIGINT)
        |   AS n_train,
        | CAST((SELECT count(*) FROM d WHERE d.day >= w.lo AND d.day <= w.hi)
        |   AS BIGINT) AS n_test
        |FROM w ORDER BY fold""".stripMargin,

    // the scoring grid rebuilt with generate_series (keys x last 7
    // days), lag-7 lookup by join, missing days zero on both sides
    "q247_seasonal_naive" ->
      """WITH daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | mx AS (SELECT max(day) AS dmax FROM daily),
        | grid AS (SELECT k.key, gs.day
        |  FROM (SELECT DISTINCT key FROM daily) k,
        |   (SELECT unnest(generate_series((SELECT dmax FROM mx) - 6,
        |      (SELECT dmax FROM mx))) AS day) gs),
        | sc AS (SELECT g.key,
        |   coalesce(a.y, 0) AS ya, coalesce(p.y, 0) AS yp
        |  FROM grid g
        |   LEFT JOIN daily a ON a.key = g.key AND a.day = g.day
        |   LEFT JOIN daily p ON p.key = g.key AND p.day = g.day - 7)
        |SELECT key AS event_type, CAST(count(*) AS BIGINT) AS n_days,
        | CAST(sum(abs(ya - yp)) AS BIGINT) AS total_ae,
        | CAST((sum(abs(ya - yp)) * 1000000) // 7 AS BIGINT) AS mae_ppm
        |FROM sc GROUP BY key ORDER BY event_type""".stripMargin,

    // window join, per-conversion k and recency rank, the
    // largest-remainder credit rule, and the full-credit direct arm;
    // conservation: sum(credit_ppm) = 1e6 * n_purchases by construction
    "q248_linear_attribution" ->
      """WITH b AS (SELECT user_id AS u,
        |   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |   event_type AS et, event_id AS eid
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
        | convs AS (SELECT u, sec AS cs, eid AS cid FROM b
        |   WHERE et = 'purchase'),
        | tch AS (SELECT u, sec AS tsx, et AS channel, eid AS tid FROM b
        |   WHERE et <> 'purchase'),
        | j AS (SELECT c.cid, t.channel, t.tsx, t.tid
        |  FROM convs c JOIN tch t ON c.u = t.u
        |   AND t.tsx >= c.cs - 3600 AND t.tsx < c.cs),
        | r AS (SELECT cid, channel,
        |   count(*) OVER (PARTITION BY cid) AS k,
        |   row_number() OVER (PARTITION BY cid
        |     ORDER BY tsx DESC, tid) AS rn FROM j),
        | cr AS (SELECT channel,
        |   1000000 // k + CASE WHEN rn <= 1000000 % k THEN 1 ELSE 0 END
        |     AS credit FROM r),
        | by_ch AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |   CAST(sum(credit) AS BIGINT) AS credit_ppm
        |  FROM cr GROUP BY channel),
        | direct AS (SELECT '__direct__' AS channel,
        |   CAST(count(*) AS BIGINT) AS n_touches,
        |   CAST(count(*) * 1000000 AS BIGINT) AS credit_ppm
        |  FROM convs WHERE cid NOT IN (SELECT DISTINCT cid FROM j)
        |  HAVING count(*) > 0)
        |SELECT * FROM by_ch UNION ALL SELECT * FROM direct
        |ORDER BY channel""".stripMargin,

    // gaps-and-islands sessionize on (epoch-us, event_id), first-3
    // prefix, concat_ws path (NULL arms dropped in both engines),
    // exact ppm share of all sessions
    "q249_session_paths" ->
      """WITH e AS (SELECT user_id AS u, event_id AS eid,
        |   event_type AS et, epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        | l AS (SELECT *, lag(us) OVER
        |    (PARTITION BY u ORDER BY us, eid) AS prev FROM e),
        | s AS (SELECT *, sum(CASE WHEN prev IS NULL
        |     OR us - prev >= 1800000000 THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY u ORDER BY us, eid
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM l),
        | r AS (SELECT u, sid, et, row_number() OVER
        |    (PARTITION BY u, sid ORDER BY us, eid) AS rn FROM s),
        | p AS (SELECT u, sid, concat_ws('>',
        |    max(CASE WHEN rn = 1 THEN et END),
        |    max(CASE WHEN rn = 2 THEN et END),
        |    max(CASE WHEN rn = 3 THEN et END)) AS path
        |  FROM r WHERE rn <= 3 GROUP BY u, sid),
        | c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |  FROM p GROUP BY path)
        |SELECT path, n_sessions,
        | CAST((n_sessions * 1000000) // (SELECT sum(n_sessions) FROM c)
        |   AS BIGINT) AS share_ppm
        |FROM c ORDER BY path""".stripMargin,

    // the whole readout replayed: md5 arm assignment, unit-grain
    // outcome, 2x2 cells, HUGEINT chi-square in milli units, exact
    // 3.841 threshold
    "q250_ab_chisquare" ->
      """WITH u AS (SELECT CAST(user_id AS VARCHAR) AS unit,
        |   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        | ar AS (SELECT y,
        |   ('0x'||substr(md5('7:'||unit),1,8))::BIGINT % 2 AS arm FROM u),
        | t AS (SELECT
        |   CAST(sum(CASE WHEN arm = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |   CAST(sum(CASE WHEN arm = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |   CAST(sum(CASE WHEN arm = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |   CAST(sum(CASE WHEN arm = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM ar),
        | g AS (SELECT a, b, c, d, a + b AS nt, c + d AS nc,
        |   CASE WHEN a+b > 0 AND c+d > 0 AND a+c > 0 AND b+d > 0
        |     AND a+b+c+d <= 10000000 THEN
        |     CAST((CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c)
        |       * (CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c)
        |       * (a+b+c+d) * 1000
        |       // (CAST(a+b AS HUGEINT) * (c+d) * (a+c) * (b+d)) AS BIGINT)
        |   END AS chi2_milli FROM t)
        |SELECT nt AS n_treat, nc AS n_control,
        | a AS conv_treat, c AS conv_control,
        | CASE WHEN nt > 0 THEN (a * 1000000) // nt END AS rate_treat_ppm,
        | CASE WHEN nc > 0 THEN (c * 1000000) // nc END AS rate_control_ppm,
        | CASE WHEN nt > 0 THEN (a * 1000000) // nt END
        |   - CASE WHEN nc > 0 THEN (c * 1000000) // nc END AS lift_ppm,
        | chi2_milli,
        | CASE WHEN chi2_milli IS NOT NULL THEN chi2_milli >= 3841 END
        |   AS significant
        |FROM g ORDER BY n_treat""".stripMargin,

    // the per-source running count-<= (RANGE frame includes peers)
    // over the same integer quality score, ppm-floored
    "q251_source_ecdf" ->
      s"""WITH d AS (SELECT doc_id, source,
         |   CAST($qualityPpmSql AS BIGINT) AS q_ppm FROM documents)
         |SELECT doc_id, source, q_ppm,
         | CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n,
         | CAST((count(*) OVER (PARTITION BY source ORDER BY q_ppm
         |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000)
         |   // (count(*) OVER (PARTITION BY source)) AS BIGINT) AS ecdf_ppm
         |FROM d ORDER BY doc_id""".stripMargin,

    // the same (epoch-us, seq) keyed window: adjacent seq inversions,
    // duplicate instants, max gap floored to seconds
    "q252_stream_hygiene" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id AS seq
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        | l AS (SELECT user_id, us, seq,
        |   lag(us) OVER (PARTITION BY user_id ORDER BY us, seq) AS pus,
        |   lag(seq) OVER (PARTITION BY user_id ORDER BY us, seq) AS pseq
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CASE WHEN pseq IS NOT NULL AND seq < pseq
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_ooo_adj,
        | CAST(sum(CASE WHEN pus IS NOT NULL AND us = pus
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_ts,
        | CAST(max(us - pus) // 1000000 AS BIGINT) AS max_gap_sec
        |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin,

    // same generated hit columns as q32, best/second by list_sort,
    // margin over the pairwise total (h1 > 0 guard -> NULL when no
    // stopword evidence)
    "q253_lang_confidence" ->
      s"""WITH sc AS (SELECT doc_id, $langHitsSql FROM documents),
         | s2 AS (SELECT doc_id, $langCaseSql AS lang,
         |   list_sort([${graft.ext.TextOps.stopwords.map(_._1 + "_h").mkString(", ")}],
         |     'DESC') AS hs
         |  FROM sc)
         |SELECT doc_id, lang,
         | CAST(hs[1] AS BIGINT) AS h1, CAST(hs[2] AS BIGINT) AS h2,
         | CAST(CASE WHEN hs[1] > 0
         |   THEN ((hs[1] - hs[2]) * 1000000) // (hs[1] + hs[2]) END
         |   AS BIGINT) AS margin_ppm
         |FROM s2 ORDER BY doc_id""".stripMargin,

    // rank trim replayed: row_number in value order, t = n/10 off each
    // end, truncating integer mean (Spark DIV == DuckDB // on negatives)
    "q254_trimmed_mean" ->
      """WITH c AS (SELECT c_mktsegment AS segment,
        |   CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM customer),
        | r AS (SELECT segment, v,
        |   row_number() OVER (PARTITION BY segment ORDER BY v) AS rn,
        |   count(*) OVER (PARTITION BY segment) AS n FROM c),
        | k AS (SELECT segment, v, n FROM r
        |  WHERE rn > (n * 1) // 10 AND rn <= n - (n * 1) // 10)
        |SELECT segment, CAST(max(n) AS BIGINT) AS n,
        | CAST(count(*) AS BIGINT) AS n_kept,
        | CAST(sum(v) // count(*) AS BIGINT) AS trimmed_mean
        |FROM k GROUP BY segment ORDER BY segment""".stripMargin,

    // the Thursday-anchored closed form replayed: g(d) = (d//7)*5 +
    // prefix[d%7], weekdays in [order_day, ship_day) = g(b) - g(a)
    "q255_business_days" ->
      """WITH li AS (SELECT l_orderkey, l_returnflag,
        |   CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 AS b
        |  FROM lineitem),
        | o AS (SELECT o_orderkey,
        |   CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS a
        |  FROM orders),
        | j AS (SELECT l_returnflag,
        |   ((b // 7) * 5 + [0,1,2,2,2,3,4,5][(b % 7) + 1])
        |   - ((a // 7) * 5 + [0,1,2,2,2,3,4,5][(a % 7) + 1])
        |     AS business_days
        |  FROM li JOIN o ON l_orderkey = o_orderkey)
        |SELECT l_returnflag, CAST(business_days AS BIGINT) AS business_days,
        | CAST(count(*) AS BIGINT) AS n
        |FROM j GROUP BY 1, 2 ORDER BY l_returnflag, business_days""".stripMargin,

    // (user, type) dedup, unordered pair intersection counts, exact
    // Jaccard over the inclusion-exclusion union
    "q256_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS t
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        | sz AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY t),
        | ix AS (SELECT a.t AS type_a, b.t AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_both
        |   FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
        |   GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
        | CAST((n_both * 1000000) // (sa.n + sb.n - n_both) AS BIGINT)
        |   AS jaccard_ppm
        |FROM ix JOIN sz sa ON sa.t = type_a JOIN sz sb ON sb.t = type_b
        |ORDER BY type_a, type_b""".stripMargin,

    // user-grain first-touch / first-conversion days, epoch-week
    // cohorts, strict < k day windows, ppm share of the cohort
    "q257_conversion_curve" ->
      """WITH e AS (SELECT user_id AS u,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, event_type AS et
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        | pu AS (SELECT u, min(day) AS first_day,
        |   min(CASE WHEN et = 'purchase' THEN day END) AS conv_day
        |  FROM e GROUP BY u)
        |SELECT first_day // 7 AS cohort_week,
        | CAST(count(*) AS BIGINT) AS n_users,
        | CAST(sum(CASE WHEN conv_day IS NOT NULL
        |   AND conv_day - first_day < 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_1d,
        | CAST(sum(CASE WHEN conv_day IS NOT NULL
        |   AND conv_day - first_day < 3 THEN 1 ELSE 0 END) AS BIGINT) AS conv_3d,
        | CAST(sum(CASE WHEN conv_day IS NOT NULL
        |   AND conv_day - first_day < 7 THEN 1 ELSE 0 END) AS BIGINT) AS conv_7d,
        | CAST((sum(CASE WHEN conv_day IS NOT NULL
        |   AND conv_day - first_day < 7 THEN 1 ELSE 0 END) * 1000000)
        |   // count(*) AS BIGINT) AS conv_7d_ppm
        |FROM pu GROUP BY 1 ORDER BY cohort_week""".stripMargin,

    // floors, largest-remainder ranking (remainder desc, n desc,
    // stratum — total), budget-minus-floors extras, population cap
    "q258_proportional_alloc" ->
      """WITH c AS (SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        | t AS (SELECT stratum, n, sum(n) OVER () AS total,
        |   (1000 * n) // sum(n) OVER () AS fl,
        |   (1000 * n) % (sum(n) OVER ()) AS rem FROM c),
        | r AS (SELECT *,
        |   1000 - sum(fl) OVER () AS extra,
        |   row_number() OVER (ORDER BY rem DESC, n DESC, stratum) AS rk
        |  FROM t)
        |SELECT stratum, n,
        | CAST(least(n, fl + CASE WHEN rk <= extra THEN 1 ELSE 0 END)
        |   AS BIGINT) AS quota
        |FROM r ORDER BY stratum""".stripMargin,

    // margins from the cell table, exact HUGEINT per-cell chi-square
    // contributions in micro units, __total__ row with statistic + df
    "q259_contingency" ->
      """WITH cells AS (SELECT source AS a, lang AS b,
        |   CAST(count(*) AS BIGINT) AS n_obs
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |  GROUP BY 1, 2),
        | m AS (SELECT a, b, n_obs,
        |   sum(n_obs) OVER (PARTITION BY a) AS r,
        |   sum(n_obs) OVER (PARTITION BY b) AS c,
        |   sum(n_obs) OVER () AS n,
        |   ((SELECT count(DISTINCT a) FROM cells) - 1)
        |     * ((SELECT count(DISTINCT b) FROM cells) - 1) AS dof
        |  FROM cells),
        | s AS (SELECT a, b, n_obs,
        |   CAST((CAST(r AS HUGEINT) * c * 1000) // n AS BIGINT) AS exp_milli,
        |   CAST((CAST(n_obs AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |     * (CAST(n_obs AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |     * 1000000 // (CAST(r AS HUGEINT) * c * n) AS BIGINT)
        |     AS chi2_micro,
        |   dof, n FROM m)
        |SELECT source, lang, n_obs, exp_milli, chi2_micro, dof FROM (
        | SELECT a AS source, b AS lang, n_obs, exp_milli, chi2_micro,
        |  CAST(NULL AS BIGINT) AS dof FROM s
        | UNION ALL
        | SELECT '__total__', '__total__', CAST(max(n) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(sum(chi2_micro) AS BIGINT),
        |  CAST(max(dof) AS BIGINT) FROM s)
        |ORDER BY source, lang""".stripMargin,

    // q258's quota plan re-derived, then the draw: md5 rank within each
    // stratum (id tiebreak), keep ranks <= quota
    "q260_allocated_sample" ->
      """WITH c AS (SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        | t AS (SELECT stratum, n, sum(n) OVER () AS total,
        |   (1000 * n) // sum(n) OVER () AS fl,
        |   (1000 * n) % (sum(n) OVER ()) AS rem FROM c),
        | q AS (SELECT stratum,
        |   least(n, fl + CASE WHEN row_number() OVER
        |     (ORDER BY rem DESC, n DESC, stratum) <=
        |       1000 - sum(fl) OVER () THEN 1 ELSE 0 END) AS quota
        |  FROM t),
        | r AS (SELECT source AS stratum, doc_id,
        |   row_number() OVER (PARTITION BY source ORDER BY
        |     ('0x'||substr(md5('5:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT,
        |     doc_id) AS rk
        |  FROM documents WHERE source IS NOT NULL)
        |SELECT r.stratum AS stratum, r.doc_id AS doc_id
        |FROM r JOIN q ON r.stratum = q.stratum AND r.rk <= q.quota
        |ORDER BY r.stratum, r.doc_id""".stripMargin,

    // Q4 priority counts under a correlated EXISTS (returned line)
    "q261_priority_exists" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Q6 one-row forecast: date + discount + quantity band, BIGINT
    // 1e-4 revenue lane; the discount band compares stored doubles
    // against the same literals on both engines
    "q262_forecast_revenue" ->
      """SELECT
        | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   CAST(l_discount AS DECIMAL(18,2)) * 10000 AS BIGINT))
        |   AS BIGINT) AS revenue_delta_e4,
        | CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24
        |ORDER BY revenue_delta_e4""".stripMargin,

    // Q9 per-(nation, year) profit over name-matched parts; unit cost
    // = retail price (no partsupp in the schema); BIGINT 1e-4 lanes
    "q263_nation_profit" ->
      """SELECT n_name AS nation, o_year,
        | CAST(sum(amount_e4) AS BIGINT) AS profit_e4
        |FROM (SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |    CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l.l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)
        |    - CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) *
        |      CAST(l.l_quantity AS DECIMAL(18,2)) * 10000 AS BIGINT) AS amount_e4
        |  FROM lineitem l
        |   JOIN part p ON p.p_partkey = l.l_partkey
        |   JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |   JOIN nation n ON s.s_nationkey = n.n_nationkey
        |   JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE p.p_name LIKE '%widget%') profit
        |GROUP BY n_name, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,

    // Q12 two-way conditional counts per line status over a ship year
    "q264_priority_linestatus" ->
      """SELECT l.l_linestatus,
        | CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l.l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    // running event-time max in arrival (event_id) order; late = more
    // than 60s behind it — the watermark-drop test replayed
    "q265_late_arrivals" ->
      """WITH e AS (SELECT event_type AS key,
        |   CAST(epoch_us(ts) AS BIGINT) AS us, event_id AS seq
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        | w AS (SELECT key, us,
        |   max(us) OVER (PARTITION BY key ORDER BY seq
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM e)
        |SELECT key AS event_type, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CASE WHEN pm IS NOT NULL AND us < pm - 60000000
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        | CAST(max(CASE WHEN pm IS NOT NULL AND us < pm - 60000000
        |   THEN (pm - us) // 1000 END) AS BIGINT) AS max_late_ms
        |FROM w GROUP BY key ORDER BY event_type""".stripMargin,

    // KMV: k=64 smallest distinct md5 hashes per key; estimate
    // (k-1)*2^32 // h_k, exact when fewer than k distinct hashes
    "q266_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT event_type AS key,
        |   ('0x'||substr(md5('11:'||CAST(user_id AS VARCHAR)),1,8))::BIGINT AS hv
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        | n AS (SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1),
        | r AS (SELECT key, hv,
        |   row_number() OVER (PARTITION BY key ORDER BY hv) AS rk,
        |   count(*) OVER (PARTITION BY key) AS nd FROM h),
        | s AS (SELECT key, max(nd) AS nd,
        |   max(CASE WHEN rk = 64 THEN hv END) AS h64 FROM r GROUP BY key)
        |SELECT s.key AS event_type, n.n_rows,
        | CAST(CASE WHEN s.nd < 64 THEN s.nd
        |   ELSE (63 * 4294967296) // s.h64 END AS BIGINT) AS est_distinct
        |FROM s JOIN n ON s.key = n.key ORDER BY event_type""".stripMargin,

    // KMV overlap: merged union min-k, membership-in-both count, the
    // union estimator and the integer jaccard over the union min-k
    "q267_kmv_overlap" ->
      """WITH h AS (SELECT DISTINCT event_type AS key,
        |   ('0x'||substr(md5('11:'||CAST(user_id AS VARCHAR)),1,8))::BIGINT AS hv
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        | r AS (SELECT key, hv,
        |   row_number() OVER (PARTITION BY key ORDER BY hv) AS rk FROM h),
        | sk AS (SELECT key, hv FROM r WHERE rk <= 64),
        | ks AS (SELECT DISTINCT key FROM sk),
        | pr AS (SELECT a.key AS key_a, b.key AS key_b
        |  FROM ks a JOIN ks b ON a.key < b.key),
        | u AS (SELECT pr.key_a, pr.key_b, sk.hv
        |   FROM pr JOIN sk ON sk.key = pr.key_a
        |  UNION
        |  SELECT pr.key_a, pr.key_b, sk.hv
        |   FROM pr JOIN sk ON sk.key = pr.key_b),
        | ur AS (SELECT key_a, key_b, hv, row_number() OVER
        |   (PARTITION BY key_a, key_b ORDER BY hv) AS rk FROM u),
        | m AS (SELECT key_a, key_b, hv, rk FROM ur WHERE rk <= 64),
        | mm AS (SELECT m.key_a, m.key_b, m.hv, m.rk,
        |   CASE WHEN sa.hv IS NOT NULL AND sb.hv IS NOT NULL
        |     THEN 1 ELSE 0 END AS in_both
        |  FROM m LEFT JOIN sk sa ON sa.key = m.key_a AND sa.hv = m.hv
        |   LEFT JOIN sk sb ON sb.key = m.key_b AND sb.hv = m.hv),
        | agg AS (SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS d,
        |   max(CASE WHEN rk = 64 THEN hv END) AS h64,
        |   CAST(sum(in_both) AS BIGINT) AS inter FROM mm GROUP BY 1, 2)
        |SELECT key_a, key_b,
        | CAST(CASE WHEN d < 64 THEN d ELSE (63 * 4294967296) // h64 END
        |   AS BIGINT) AS union_est,
        | inter AS n_common_mink,
        | CAST((inter * 1000000) // d AS BIGINT) AS jaccard_ppm
        |FROM agg ORDER BY key_a, key_b""".stripMargin,

    // the t-closeness walk replayed: per level, each class's total-
    // variation deviation sum vs the global segment distribution in
    // HUGEINT lanes, release test n>=3 AND num*1e6 <= 2*t*n*N, first
    // passing level wins (last-level fallback)
    "q268_t_closeness" ->
      """WITH c AS (SELECT c_mktsegment AS seg,
        |    CAST(c_nationkey AS BIGINT) AS nat,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        | g AS (SELECT seg AS v, CAST(count(*) AS BIGINT) AS gv
        |  FROM c GROUP BY 1),
        | tot AS (SELECT CAST(sum(gv) AS BIGINT) AS N FROM g),
        | q0 AS (SELECT nat AS geo,
        |    (cents - ((cents % 10000) + 10000) % 10000) // 10000 AS bal,
        |    seg AS v, CAST(count(*) AS BIGINT) AS cv FROM c GROUP BY 1,2,3),
        | q1 AS (SELECT nat AS geo,
        |    (cents - ((cents % 100000) + 100000) % 100000) // 100000 AS bal,
        |    seg AS v, CAST(count(*) AS BIGINT) AS cv FROM c GROUP BY 1,2,3),
        | q2 AS (SELECT nat // 5 AS geo,
        |    CAST(CASE WHEN cents >= 0 THEN 1 ELSE 0 END AS BIGINT) AS bal,
        |    seg AS v, CAST(count(*) AS BIGINT) AS cv FROM c GROUP BY 1,2,3),
        | q3 AS (SELECT CAST(-1 AS BIGINT) AS geo, CAST(0 AS BIGINT) AS bal,
        |    seg AS v, CAST(count(*) AS BIGINT) AS cv FROM c GROUP BY 1,2,3),
        | cells AS (SELECT 0 AS lvl, * FROM q0 UNION ALL
        |   SELECT 1, * FROM q1 UNION ALL
        |   SELECT 2, * FROM q2 UNION ALL
        |   SELECT 3, * FROM q3),
        | cls AS (SELECT lvl, geo, bal, CAST(sum(cv) AS BIGINT) AS n
        |  FROM cells GROUP BY 1,2,3),
        | tv AS (SELECT cls.lvl, cls.geo, cls.bal, cls.n,
        |   CAST(sum(abs(CAST(coalesce(ce.cv, 0) AS HUGEINT) * tot.N
        |     - CAST(g.gv AS HUGEINT) * cls.n)) AS HUGEINT) AS num,
        |   max(tot.N) AS tot_n
        |  FROM cls CROSS JOIN g CROSS JOIN tot
        |   LEFT JOIN cells ce ON ce.lvl = cls.lvl AND ce.geo = cls.geo
        |    AND ce.bal = cls.bal AND ce.v = g.v
        |  GROUP BY 1, 2, 3, 4),
        | lv AS (SELECT lvl,
        |   min(CASE WHEN n >= 3 AND num * 1000000
        |     <= CAST(2 AS HUGEINT) * 300000 * n * tot_n THEN 1 ELSE 0 END) AS ok
        |  FROM tv GROUP BY 1),
        | pick AS (SELECT CASE
        |    WHEN (SELECT ok FROM lv WHERE lvl = 0) = 1 THEN 0
        |    WHEN (SELECT ok FROM lv WHERE lvl = 1) = 1 THEN 1
        |    WHEN (SELECT ok FROM lv WHERE lvl = 2) = 1 THEN 2
        |    ELSE 3 END AS lvl)
        |SELECT geo, bal, n,
        | CAST((num * 1000000) // (CAST(2 AS HUGEINT) * n * tot_n) AS BIGINT)
        |   AS tv_ppm,
        | CAST(lvl AS BIGINT) AS level
        |FROM tv WHERE lvl = (SELECT lvl FROM pick)
        |ORDER BY geo, bal""".stripMargin,

    // Spearman: tie-averaged doubled ranks, five HUGEINT component
    // sums, signed rho^2 in ppm via the two-step x1000 decomposition
    "q269_spearman" ->
      """WITH e AS (SELECT event_type AS key,
        |   CAST(floor(value * 1000) AS BIGINT) AS x,
        |   CAST(floor(epoch(ts)) AS BIGINT) AS y
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL),
        | r AS (SELECT key,
        |   2 * rank() OVER (PARTITION BY key ORDER BY x)
        |     + count(*) OVER (PARTITION BY key, x) - 1 AS rx,
        |   2 * rank() OVER (PARTITION BY key ORDER BY y)
        |     + count(*) OVER (PARTITION BY key, y) - 1 AS ry
        |  FROM e),
        | a AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(ry) AS HUGEINT) AS sy,
        |   sum(CAST(rx AS HUGEINT) * ry) AS sxy,
        |   sum(CAST(rx AS HUGEINT) * rx) AS sxx,
        |   sum(CAST(ry AS HUGEINT) * ry) AS syy
        |  FROM r GROUP BY 1),
        | v AS (SELECT key, n,
        |   CAST(n AS HUGEINT) * sxy - sx * sy AS cov,
        |   CAST(n AS HUGEINT) * sxx - sx * sx AS vx,
        |   CAST(n AS HUGEINT) * syy - sy * sy AS vy FROM a)
        |SELECT key AS event_type, n,
        | CAST(CASE WHEN n <= 30000 AND vx > 0 AND vy > 0 THEN
        |   (CASE WHEN cov < 0 THEN -1 ELSE 1 END)
        |   * (((cov * cov * 1000) // (vx * vy)) * 1000
        |      + (((cov * cov * 1000) % (vx * vy)) * 1000) // (vx * vy))
        |   END AS BIGINT) AS rho2_signed_ppm
        |FROM v ORDER BY event_type""".stripMargin,

    // Mann-Whitney: pooled tie-averaged doubled ranks, 2U_b from the
    // group-b rank sum, cleared 1.96 z-test and rank-biserial ppm
    "q270_mann_whitney" ->
      """WITH e AS (SELECT event_type AS key,
        |   (((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7)
        |     IN (0, 6) AS b,
        |   CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL),
        | r AS (SELECT key, b,
        |   2 * rank() OVER (PARTITION BY key ORDER BY v)
        |     + count(*) OVER (PARTITION BY key, v) - 1 AS r2
        |  FROM e),
        | a AS (SELECT key,
        |   CAST(sum(CASE WHEN b THEN 0 ELSE 1 END) AS BIGINT) AS n_a,
        |   CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |   CAST(sum(CASE WHEN b THEN r2 ELSE 0 END) AS BIGINT) AS r2b
        |  FROM r GROUP BY 1),
        | u AS (SELECT key, n_a, n_b,
        |   CASE WHEN n_a > 0 AND n_b > 0
        |     THEN r2b - n_b * (n_b + 1) END AS u2_b FROM a)
        |SELECT key AS event_type, n_a, n_b, u2_b,
        | CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN
        |   (CAST(u2_b AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b) * 1000000
        |     // (CAST(n_a AS HUGEINT) * n_b) END AS BIGINT)
        |   AS rank_biserial_ppm,
        | CASE WHEN n_a > 0 AND n_b > 0 THEN
        |   (CAST(u2_b AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b)
        |   * (CAST(u2_b AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b)
        |   * 30000 > CAST(38416 AS HUGEINT) * n_a * n_b * (n_a + n_b + 1)
        |   END AS significant
        |FROM u ORDER BY event_type""".stripMargin,

    // KS: pooled RANGE-frame cumulative counts (ties collapse), max
    // integer ECDF-gap numerator, cleared 1.358 test and ppm gap
    "q271_ks_test" ->
      """WITH e AS (SELECT event_type AS key,
        |   (((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7)
        |     IN (0, 6) AS b,
        |   CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL),
        | w AS (SELECT key,
        |   sum(CASE WHEN b THEN 0 ELSE 1 END) OVER (PARTITION BY key
        |     ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |   sum(CASE WHEN b THEN 1 ELSE 0 END) OVER (PARTITION BY key
        |     ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
        |   sum(CASE WHEN b THEN 0 ELSE 1 END) OVER (PARTITION BY key) AS na,
        |   sum(CASE WHEN b THEN 1 ELSE 0 END) OVER (PARTITION BY key) AS nb
        |  FROM e),
        | a AS (SELECT key, CAST(max(na) AS BIGINT) AS n_a,
        |   CAST(max(nb) AS BIGINT) AS n_b,
        |   max(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na))
        |     AS dnum
        |  FROM w GROUP BY 1)
        |SELECT key AS event_type, n_a, n_b,
        | CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN (dnum * 1000000)
        |   // (CAST(n_a AS HUGEINT) * n_b) END AS BIGINT) AS d_ppm,
        | CASE WHEN n_a > 0 AND n_b > 0 THEN dnum * dnum * 10000
        |   > CAST(18441 AS HUGEINT) * n_a * n_b * (n_a + n_b) END
        |   AS significant
        |FROM a ORDER BY event_type""".stripMargin,

    // permutation test: every relabeling is a seeded-md5 hash family
    // member, so the oracle replays all 199 permutation statistics and
    // the add-one p-value bit-exactly; arm-size-cleared >= comparison
    "q272_permutation_test" ->
      """WITH u AS (SELECT CAST(user_id AS VARCHAR) AS unit,
        |   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS uv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL GROUP BY 1),
        | ob AS (SELECT
        |   CAST(sum(CASE WHEN ('0x'||substr(md5('7:'||unit),1,8))::BIGINT
        |     % 2 = 1 THEN uv ELSE 0 END) AS BIGINT) AS s1,
        |   CAST(sum(CASE WHEN ('0x'||substr(md5('7:'||unit),1,8))::BIGINT
        |     % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |   CAST(sum(CASE WHEN ('0x'||substr(md5('7:'||unit),1,8))::BIGINT
        |     % 2 = 0 THEN uv ELSE 0 END) AS BIGINT) AS s0,
        |   CAST(sum(CASE WHEN ('0x'||substr(md5('7:'||unit),1,8))::BIGINT
        |     % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
        |  FROM u),
        | obs AS (SELECT abs(CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT)
        |   * n1) AS t_obs, n1 AS n1_obs, n0 AS n0_obs FROM ob),
        | pa AS (SELECT g.p, u.uv,
        |   ('0x'||substr(md5(CAST(1000 + g.p AS VARCHAR)||':'||u.unit),1,8)
        |     )::BIGINT % 2 AS arm
        |  FROM u CROSS JOIN (SELECT unnest(generate_series(0, 198)) AS p) g),
        | pr AS (SELECT p,
        |   CAST(sum(CASE WHEN arm = 1 THEN uv ELSE 0 END) AS BIGINT) AS s1,
        |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |   CAST(sum(CASE WHEN arm = 0 THEN uv ELSE 0 END) AS BIGINT) AS s0,
        |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
        |  FROM pa GROUP BY 1),
        | f AS (SELECT count(*) AS n_perms,
        |   sum(CASE WHEN abs(CAST(pr.s1 AS HUGEINT) * pr.n0
        |       - CAST(pr.s0 AS HUGEINT) * pr.n1)
        |       * (CAST(n1_obs AS HUGEINT) * n0_obs)
        |     >= t_obs * (CAST(pr.n1 AS HUGEINT) * pr.n0)
        |     THEN 1 ELSE 0 END) AS n_ge,
        |   max(n1_obs) AS n_treat, max(n0_obs) AS n_control
        |  FROM pr CROSS JOIN obs)
        |SELECT CAST(n_treat AS BIGINT) AS n_treat,
        | CAST(n_control AS BIGINT) AS n_control,
        | CAST(n_perms AS BIGINT) AS n_perms, CAST(n_ge AS BIGINT) AS n_ge,
        | CAST(CASE WHEN n_treat > 0 AND n_control > 0
        |   THEN ((1 + n_ge) * 1000000) // (n_perms + 1) END AS BIGINT)
        |   AS p_value_ppm,
        | CASE WHEN n_treat > 0 AND n_control > 0
        |   THEN (1 + n_ge) * 20 <= n_perms + 1 END AS significant
        |FROM f ORDER BY n_treat""".stripMargin,

    // Poisson bootstrap: replicate weights are integer hash-vs-threshold
    // comparisons (Poisson(1) inverse-CDF baked into 2^32-scaled literal
    // thresholds), so all 199 weighted means and both percentile order
    // statistics replay exactly
    "q273_poisson_bootstrap" ->
      """WITH u AS (SELECT CAST(user_id AS VARCHAR) AS unit,
        |   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS uv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL GROUP BY 1),
        | ob AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
        |   CAST((sum(CAST(uv AS HUGEINT)) * 100) // count(*) AS BIGINT)
        |     AS mean_centi FROM u),
        | hx AS (SELECT g.r, u.uv,
        |   ('0x'||substr(md5(CAST(2000 + g.r AS VARCHAR)||':'||u.unit),1,8)
        |     )::BIGINT AS h
        |  FROM u CROSS JOIN (SELECT unnest(generate_series(0, 198)) AS r) g),
        | wx AS (SELECT r, uv,
        |   (CASE WHEN h >= 1580030168 THEN 1 ELSE 0 END)
        |   + (CASE WHEN h >= 3160060337 THEN 1 ELSE 0 END)
        |   + (CASE WHEN h >= 3950075421 THEN 1 ELSE 0 END)
        |   + (CASE WHEN h >= 4213413783 THEN 1 ELSE 0 END)
        |   + (CASE WHEN h >= 4279248373 THEN 1 ELSE 0 END)
        |   + (CASE WHEN h >= 4292415291 THEN 1 ELSE 0 END)
        |   + (CASE WHEN h >= 4294609777 THEN 1 ELSE 0 END)
        |   + (CASE WHEN h >= 4294923276 THEN 1 ELSE 0 END)
        |   + (CASE WHEN h >= 4294962463 THEN 1 ELSE 0 END)
        |   + (CASE WHEN h >= 4294966817 THEN 1 ELSE 0 END) AS w
        |  FROM hx),
        | rep AS (SELECT r, sum(CAST(w AS HUGEINT) * uv) AS ws,
        |   sum(CAST(w AS HUGEINT)) AS wn FROM wx GROUP BY 1),
        | rm AS (SELECT r,
        |   CAST(CASE WHEN wn > 0 THEN (ws * 100) // wn END AS BIGINT) AS m
        |  FROM rep),
        | q AS (SELECT m, row_number() OVER (ORDER BY m, r) AS rn,
        |   count(*) OVER () AS cnt FROM rm WHERE m IS NOT NULL),
        | f AS (SELECT CAST(max(cnt) AS BIGINT) AS n_reps,
        |   CAST(min(CASE WHEN rn = greatest(1, ((cnt + 1) * 25) // 1000)
        |     THEN m END) AS BIGINT) AS ci_lo_centi,
        |   CAST(min(CASE WHEN rn = cnt + 1
        |       - greatest(1, ((cnt + 1) * 25) // 1000)
        |     THEN m END) AS BIGINT) AS ci_hi_centi
        |  FROM q)
        |SELECT n_units, n_reps, mean_centi, ci_lo_centi, ci_hi_centi
        |FROM f CROSS JOIN ob ORDER BY n_units""".stripMargin,

    // Kaplan-Meier: duration cells, at-risk counts from above, then the
    // per-step floored ppm recurrence replayed by a recursive CTE
    "q274_kaplan_meier" ->
      """WITH RECURSIVE b AS (SELECT event_type AS key,
        |   CAST(user_id AS VARCHAR) AS unit,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |    AND ts IS NOT NULL),
        | sp AS (SELECT key, unit, min(day) AS d0, max(day) AS d1
        |  FROM b GROUP BY 1, 2),
        | mx AS (SELECT max(day) AS max_day FROM b),
        | cl AS (SELECT key, d1 - d0 AS dur,
        |   CASE WHEN d1 + 7 <= max_day THEN 1 ELSE 0 END AS death
        |  FROM sp CROSS JOIN mx),
        | ce AS (SELECT key, dur, CAST(count(*) AS BIGINT) AS n_all,
        |   CAST(sum(death) AS BIGINT) AS n_death
        |  FROM cl GROUP BY 1, 2),
        | st AS (SELECT key, dur, n_death,
        |   CAST(sum(n_all) OVER (PARTITION BY key ORDER BY dur DESC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |     AS nr
        |  FROM ce),
        | sq AS (SELECT key, dur, n_death, nr,
        |   row_number() OVER (PARTITION BY key ORDER BY dur) AS i
        |  FROM st WHERE n_death > 0),
        | rec AS (
        |  SELECT key, i, dur, nr, n_death,
        |    (1000000 * (nr - n_death)) // nr AS s
        |  FROM sq WHERE i = 1
        |  UNION ALL
        |  SELECT sq.key, sq.i, sq.dur, sq.nr, sq.n_death,
        |    (rec.s * (sq.nr - sq.n_death)) // sq.nr
        |  FROM sq JOIN rec ON sq.key = rec.key AND sq.i = rec.i + 1)
        |SELECT key AS event_type, CAST(dur AS BIGINT) AS t_day,
        | nr AS n_risk, n_death AS n_deaths, CAST(s AS BIGINT) AS survival_ppm
        |FROM rec ORDER BY event_type, t_day""".stripMargin,

    // CUPED: pre-period covariate per unit, pooled milli-slope floored
    // once, composed adjustment; every floor replayed in HUGEINT lanes
    "q275_cuped" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS unit,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        | mx AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
        | u AS (SELECT unit,
        |   CAST(sum(CASE WHEN day > mid THEN cents ELSE 0 END) AS BIGINT)
        |     AS uy,
        |   CAST(sum(CASE WHEN day <= mid THEN cents ELSE 0 END) AS BIGINT)
        |     AS ux
        |  FROM e CROSS JOIN mx GROUP BY 1),
        | a AS (SELECT uy, ux,
        |   ('0x'||substr(md5('7:'||unit),1,8))::BIGINT % 2 AS arm FROM u),
        | g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n_t,
        |   CAST(sum(CASE WHEN arm = 1 THEN uy ELSE 0 END) AS HUGEINT) AS sy_t,
        |   CAST(sum(CASE WHEN arm = 0 THEN uy ELSE 0 END) AS HUGEINT) AS sy_c,
        |   CAST(sum(CASE WHEN arm = 1 THEN ux ELSE 0 END) AS HUGEINT) AS sx_t,
        |   CAST(sum(CASE WHEN arm = 0 THEN ux ELSE 0 END) AS HUGEINT) AS sx_c,
        |   CAST(sum(CAST(uy AS HUGEINT)) AS HUGEINT) AS sy,
        |   CAST(sum(CAST(ux AS HUGEINT)) AS HUGEINT) AS sx,
        |   CAST(sum(CAST(ux AS HUGEINT) * uy) AS HUGEINT) AS sxy,
        |   CAST(sum(CAST(ux AS HUGEINT) * ux) AS HUGEINT) AS sxx,
        |   CAST(sum(CAST(uy AS HUGEINT) * uy) AS HUGEINT) AS syy
        |  FROM a),
        | t AS (SELECT n, n_t, n - n_t AS n_c, sy_t, sy_c, sx_t, sx_c,
        |   n * sxy - sx * sy AS theta_n, n * sxx - sx * sx AS theta_d,
        |   n * syy - sy * sy AS v_y, n_t > 0 AND n - n_t > 0 AS ok
        |  FROM g),
        | r AS (SELECT n, n_t, n_c, theta_n, theta_d, v_y, ok,
        |   CASE WHEN ok THEN ((sy_t * n_c - sy_c * n_t) * 1000)
        |     // (n_t * n_c) END AS delta_raw_milli,
        |   CASE WHEN ok THEN ((sx_t * n_c - sx_c * n_t) * 1000)
        |     // (n_t * n_c) END AS delta_x_milli,
        |   CASE WHEN ok AND theta_d > 0 THEN (theta_n * 1000) // theta_d
        |     END AS theta_milli
        |  FROM t)
        |SELECT CAST(n AS BIGINT) AS n_units, CAST(n_t AS BIGINT) AS n_treat,
        | CAST(n_c AS BIGINT) AS n_control,
        | CAST(delta_raw_milli AS BIGINT) AS delta_raw_milli,
        | CAST(delta_x_milli AS BIGINT) AS delta_x_milli,
        | CAST(theta_milli AS BIGINT) AS theta_milli,
        | CAST(CASE WHEN theta_milli IS NOT NULL THEN delta_raw_milli
        |   - (theta_milli * delta_x_milli) // 1000 END AS BIGINT)
        |   AS delta_cuped_milli,
        | CAST(CASE WHEN theta_milli IS NOT NULL AND v_y > 0 THEN
        |   theta_milli * ((theta_n * 1000) // v_y) END AS BIGINT)
        |   AS rho2_ppm
        |FROM r ORDER BY n_units""".stripMargin,

    // power analysis: cleared variance numerator, MDE^2 floored once,
    // exact +-1-corrected integer sqrt (floor of the correctly-rounded
    // IEEE sqrt is within 1 of isqrt on every engine), ceil division
    "q276_power_analysis" ->
      """WITH u AS (SELECT CAST(user_id AS VARCHAR) AS unit,
        |   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS uv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL GROUP BY 1),
        | a AS (SELECT uv,
        |   ('0x'||substr(md5('7:'||unit),1,8))::BIGINT % 2 AS arm FROM u),
        | g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n_t,
        |   CAST(sum(CASE WHEN arm = 1 THEN uv ELSE 0 END) AS HUGEINT) AS s_t,
        |   CAST(sum(CASE WHEN arm = 0 THEN uv ELSE 0 END) AS HUGEINT) AS s_c,
        |   CAST(sum(CAST(uv AS HUGEINT)) AS HUGEINT) AS sv,
        |   CAST(sum(CAST(uv AS HUGEINT) * uv) AS HUGEINT) AS svv
        |  FROM a),
        | t AS (SELECT n, n_t, n - n_t AS n_c, s_t, s_c,
        |   n * svv - sv * sv AS vn,
        |   n >= 2 AND n_t > 0 AND n - n_t > 0 AS ok
        |  FROM g),
        | r AS (SELECT n, n_t, n_c, vn, ok,
        |   CASE WHEN n >= 2 THEN vn // (n * (n - 1)) END AS var_centi2,
        |   CASE WHEN ok THEN (7848880 * vn * (n_t + n_c))
        |     // (1000000 * n * (n - 1) * n_t * n_c) END AS mde2,
        |   CASE WHEN ok THEN (s_t * n_c - s_c * n_t) // (n_t * n_c)
        |     END AS delta_centi
        |  FROM t),
        | s AS (SELECT r.*, CAST(floor(sqrt(CAST(mde2 AS DOUBLE)))
        |   AS BIGINT) AS c0 FROM r)
        |SELECT CAST(n AS BIGINT) AS n_units, CAST(n_t AS BIGINT) AS n_treat,
        | CAST(n_c AS BIGINT) AS n_control,
        | CAST(var_centi2 AS BIGINT) AS var_centi2,
        | CAST(CASE WHEN mde2 IS NULL THEN NULL
        |   WHEN CAST(c0 + 1 AS HUGEINT) * (c0 + 1) <= mde2 THEN c0 + 1
        |   WHEN CAST(c0 AS HUGEINT) * c0 > mde2 THEN c0 - 1
        |   ELSE c0 END AS BIGINT) AS mde_centi,
        | CAST(delta_centi AS BIGINT) AS delta_centi,
        | CAST(CASE WHEN ok AND delta_centi != 0 THEN
        |   (2 * 7848880 * vn
        |     + 1000000 * n * (n - 1) * delta_centi * delta_centi - 1)
        |   // (1000000 * n * (n - 1) * delta_centi * delta_centi) END
        |   AS BIGINT) AS n_per_arm_req
        |FROM s ORDER BY n_units""".stripMargin,

    // calibration: q128's percentile as predicted pass-probability vs
    // the q86 funnel label; per-bin n cancels out of the ECE, so the
    // headline number is (sum of per-bin |Sconf - 1e6*Sy|) // N
    "q277_calibration" ->
      s"""WITH q AS (SELECT doc_id, lang, text,
         |    CAST($qualityPpmSql AS BIGINT) AS quality_ppm FROM documents),
         | r AS (SELECT lang, text, quality_ppm,
         |   rank() OVER (PARTITION BY lang ORDER BY quality_ppm NULLS FIRST)
         |     AS rk,
         |   count(*) OVER (PARTITION BY lang) AS cnt FROM q),
         | p AS (SELECT
         |   CASE WHEN cnt > 1 THEN ((rk - 1) * 1000000) // (cnt - 1)
         |     ELSE 0 END AS conf0,
         |   string_split(text,' ') AS l, text FROM r),
         | lb AS (SELECT least(greatest(conf0, 0), 1000000) AS conf,
         |   CASE WHEN length(text) >= 200 AND len(l) BETWEEN 30 AND 2000
         |     AND floor((len(l) - len(list_distinct(l))) * 1000000 / len(l))
         |       < 300000
         |     AND floor((length(text) - (len(l) - 1)) * 100 / len(l))
         |       BETWEEN 300 AND 1000
         |    THEN 1 ELSE 0 END AS y FROM p),
         | b AS (SELECT least((conf * 10) // 1000000, 9) AS bin, conf, y
         |  FROM lb),
         | c AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |   CAST(sum(CAST(conf AS HUGEINT)) AS HUGEINT) AS sc,
         |   CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy
         |  FROM b GROUP BY 1),
         | t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |   CAST(sum(abs(sc - sy * 1000000)) AS HUGEINT) AS gap FROM c)
         |SELECT CAST(bin AS BIGINT) AS bin, n,
         | CAST(sc // n AS BIGINT) AS mean_conf_ppm,
         | CAST((sy * 1000000) // n AS BIGINT) AS acc_ppm,
         | CAST(NULL AS BIGINT) AS ece_ppm FROM c
         |UNION ALL
         |SELECT -1, nn, NULL, NULL,
         | CAST(CASE WHEN nn > 0 THEN gap // nn END AS BIGINT) FROM t
         |ORDER BY bin""".stripMargin,

    // split-conformal: calibration residual rank 14 of 14 = the 90%
    // conformal width for the week-seasonal naive; coverage on the
    // held-out final week, all integer
    "q278_conformal_interval" ->
      """WITH daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | mx AS (SELECT max(day) AS dmax FROM daily),
        | cal AS (SELECT k.key, gs.day
        |  FROM (SELECT DISTINCT key FROM daily) k,
        |   (SELECT unnest(generate_series((SELECT dmax FROM mx) - 20,
        |      (SELECT dmax FROM mx) - 7)) AS day) gs),
        | cr AS (SELECT g.key, g.day,
        |   abs(coalesce(a.y, 0) - coalesce(p.y, 0)) AS r
        |  FROM cal g
        |   LEFT JOIN daily a ON a.key = g.key AND a.day = g.day
        |   LEFT JOIN daily p ON p.key = g.key AND p.day = g.day - 7),
        | rk AS (SELECT key, r,
        |   row_number() OVER (PARTITION BY key ORDER BY r, day) AS rn
        |  FROM cr),
        | qh AS (SELECT key, r AS width FROM rk WHERE rn = 14),
        | te AS (SELECT k.key, gs.day
        |  FROM (SELECT DISTINCT key FROM daily) k,
        |   (SELECT unnest(generate_series((SELECT dmax FROM mx) - 6,
        |      (SELECT dmax FROM mx))) AS day) gs),
        | tr AS (SELECT g.key,
        |   abs(coalesce(a.y, 0) - coalesce(p.y, 0)) AS r
        |  FROM te g
        |   LEFT JOIN daily a ON a.key = g.key AND a.day = g.day
        |   LEFT JOIN daily p ON p.key = g.key AND p.day = g.day - 7),
        | ag AS (SELECT tr.key, max(qh.width) AS width,
        |   CAST(count(*) AS BIGINT) AS n_test,
        |   CAST(sum(CASE WHEN tr.r <= qh.width THEN 1 ELSE 0 END) AS BIGINT)
        |     AS n_cov
        |  FROM tr LEFT JOIN qh ON qh.key = tr.key GROUP BY 1)
        |SELECT key AS event_type, CAST(14 AS BIGINT) AS n_calib,
        | CAST(width AS BIGINT) AS width, n_test,
        | CASE WHEN width IS NOT NULL THEN n_cov END AS n_covered,
        | CAST(CASE WHEN width IS NOT NULL THEN (n_cov * 1000000) // n_test
        |   END AS BIGINT) AS coverage_ppm
        |FROM ag ORDER BY event_type""".stripMargin,

    // quantile normalization: within-lang percentile -> pooled value at
    // the same permille (rank-selected grid, equi-join on g)
    "q279_quantile_normalize" ->
      s"""WITH q AS (SELECT doc_id, lang,
         |    CAST($qualityPpmSql AS BIGINT) AS quality_ppm FROM documents),
         | p AS (SELECT doc_id, lang, quality_ppm,
         |   CASE WHEN cnt > 1 THEN ((rk - 1) * 1000000) // (cnt - 1)
         |     ELSE 0 END AS pct_ppm
         |  FROM (SELECT doc_id, lang, quality_ppm,
         |    rank() OVER (PARTITION BY lang ORDER BY quality_ppm) AS rk,
         |    count(*) OVER (PARTITION BY lang) AS cnt FROM q)),
         | pool AS (SELECT quality_ppm AS v,
         |   row_number() OVER (ORDER BY quality_ppm) AS rn FROM q),
         | n1 AS (SELECT count(*) AS n FROM q),
         | grid AS (SELECT gs.g, pool.v AS norm_score
         |  FROM (SELECT unnest(generate_series(0, 1000)) AS g) gs
         |   CROSS JOIN n1
         |   JOIN pool ON pool.rn = 1 + ((n1.n - 1) * gs.g) // 1000)
         |SELECT p.doc_id, p.lang, p.quality_ppm,
         | CAST(p.pct_ppm AS BIGINT) AS pct_ppm,
         | CAST(grid.norm_score AS BIGINT) AS norm_score
         |FROM p JOIN grid ON grid.g = p.pct_ppm // 1000
         |ORDER BY doc_id""".stripMargin,

    // the grid alone (q319): the oracle builds it with a plain global
    // row_number sort — the engine's histogram/rank decomposition must
    // reproduce every one of the 1001 order statistics exactly
    "q319_pooled_grid" ->
      s"""WITH q AS (SELECT CAST($qualityPpmSql AS BIGINT) AS quality_ppm
         |  FROM documents),
         | pool AS (SELECT quality_ppm AS v,
         |   row_number() OVER (ORDER BY quality_ppm) AS rn FROM q),
         | n1 AS (SELECT count(*) AS n FROM q)
         |SELECT CAST(gs.g AS BIGINT) AS g, CAST(pool.v AS BIGINT) AS norm_score
         |FROM (SELECT unnest(generate_series(0, 1000)) AS g) gs
         | CROSS JOIN n1
         | JOIN pool ON pool.rn = 1 + ((n1.n - 1) * gs.g) // 1000
         |ORDER BY g""".stripMargin,

    // KMV rollup: min-k merge is lossless, so every level recomputed
    // from scratch here must equal the engine's leaf-merged sketches
    "q280_kmv_rollup" ->
      """WITH b AS (SELECT event_type AS l1,
        |   CAST((((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7)
        |     AS VARCHAR) AS l2,
        |   user_id
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND user_id IS NOT NULL),
        | hx AS (SELECT l1, l2,
        |   ('0x'||substr(md5('11:'||CAST(user_id AS VARCHAR)),1,8))::BIGINT
        |     AS hv FROM b),
        | h2 AS (SELECT DISTINCT l1, l2, hv FROM hx),
        | r2 AS (SELECT l1, l2, hv,
        |   row_number() OVER (PARTITION BY l1, l2 ORDER BY hv) AS rk,
        |   count(*) OVER (PARTITION BY l1, l2) AS nd FROM h2),
        | s2 AS (SELECT l1, l2, max(nd) AS nd,
        |   max(CASE WHEN rk = 64 THEN hv END) AS h64 FROM r2 GROUP BY 1, 2),
        | n2 AS (SELECT l1, l2, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM b GROUP BY 1, 2),
        | h1 AS (SELECT DISTINCT l1, hv FROM hx),
        | r1 AS (SELECT l1, hv,
        |   row_number() OVER (PARTITION BY l1 ORDER BY hv) AS rk,
        |   count(*) OVER (PARTITION BY l1) AS nd FROM h1),
        | s1 AS (SELECT l1, max(nd) AS nd,
        |   max(CASE WHEN rk = 64 THEN hv END) AS h64 FROM r1 GROUP BY 1),
        | n1 AS (SELECT l1, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM b GROUP BY 1),
        | h0 AS (SELECT DISTINCT hv FROM hx),
        | r0 AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rk,
        |   count(*) OVER () AS nd FROM h0),
        | s0 AS (SELECT max(nd) AS nd,
        |   max(CASE WHEN rk = 64 THEN hv END) AS h64 FROM r0),
        | n0 AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM b)
        |SELECT * FROM (
        | SELECT CAST(2 AS BIGINT) AS lvl, s2.l1, s2.l2, n2.n_rows,
        |  CAST(CASE WHEN s2.nd < 64 THEN s2.nd
        |    ELSE (63 * 4294967296) // s2.h64 END AS BIGINT) AS est_distinct
        | FROM s2 JOIN n2 ON s2.l1 = n2.l1 AND s2.l2 = n2.l2
        | UNION ALL
        | SELECT 1, s1.l1, NULL, n1.n_rows,
        |  CAST(CASE WHEN s1.nd < 64 THEN s1.nd
        |    ELSE (63 * 4294967296) // s1.h64 END AS BIGINT)
        | FROM s1 JOIN n1 ON s1.l1 = n1.l1
        | UNION ALL
        | SELECT 0, NULL, NULL, n0.n_rows,
        |  CAST(CASE WHEN s0.nd < 64 THEN s0.nd
        |    ELSE (63 * 4294967296) // s0.h64 END AS BIGINT)
        | FROM s0 CROSS JOIN n0)
        |ORDER BY lvl, l1 NULLS FIRST, l2 NULLS FIRST""".stripMargin,

    // q167's retrieval CTEs + position-level NDCG/MRR with the literal
    // micro discount table (authoring-time floor(1e6/log2(i+1)))
    "q281_ranking_eval" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         | c AS (SELECT vec_id AS vid, v AS cv FROM e),
         | xs AS (SELECT qid, vid, $cosExpr AS cos FROM q, c WHERE qid <> vid),
         | xr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk FROM xs),
         | ex AS (SELECT qid, vid FROM xr WHERE rk <= 10),
         | hp AS (SELECT vec_id AS pid, v AS pv,
         |         ('0x'||substr(md5('9:'||CAST(vec_id AS VARCHAR)),1,8))::BIGINT AS hsh FROM e),
         | p AS (SELECT pid, pv, cent_id FROM (
         |        SELECT pid, pv, CAST(row_number() OVER (ORDER BY hsh, pid) AS BIGINT) AS cent_id
         |        FROM hp) WHERE cent_id <= 32),
         | ac AS (SELECT vid, cv, cent_id FROM (
         |        SELECT e.vec_id AS vid, e.v AS cv, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $pivotDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p) WHERE cr = 1),
         | aq AS (SELECT qid, qv, cent_id FROM (
         |        SELECT e.vec_id AS qid, e.v AS qv, p.cent_id,
         |         row_number() OVER (PARTITION BY e.vec_id ORDER BY $pivotDist, p.cent_id) AS cr
         |        FROM e CROSS JOIN p WHERE e.vec_id < 5) WHERE cr <= 8),
         | sa AS (SELECT qid, vid, $cosExpr AS cos FROM aq JOIN ac USING (cent_id) WHERE qid <> vid),
         | ar AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk FROM sa),
         | w AS (SELECT * FROM (VALUES (1, 1000000), (2, 630929), (3, 500000),
         |        (4, 430676), (5, 386852), (6, 356207), (7, 333333),
         |        (8, 315464), (9, 301029), (10, 289064)) AS t(rk, wt)),
         | iw AS (SELECT * FROM (VALUES (1, 1000000), (2, 1630929),
         |        (3, 2130929), (4, 2561605), (5, 2948457), (6, 3304664),
         |        (7, 3637997), (8, 3953461), (9, 4254490), (10, 4543554))
         |        AS t(nr, idcg)),
         | j AS (SELECT ar.qid, ar.rk,
         |        CASE WHEN ex.vid IS NULL THEN 0 ELSE 1 END AS rel
         |       FROM ar LEFT JOIN ex ON ar.qid = ex.qid AND ar.vid = ex.vid
         |       WHERE ar.rk <= 10),
         | jc AS (SELECT qid, rk, rel,
         |        sum(rel) OVER (PARTITION BY qid ORDER BY rk
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |       FROM j),
         | d AS (SELECT jc.qid, sum(jc.rel * w.wt) AS dcg,
         |        min(CASE WHEN jc.rel = 1 THEN jc.rk END) AS fh,
         |        sum(CASE WHEN jc.rel = 1
         |          THEN (jc.cum * 1000000) // jc.rk END) AS ap_sum
         |       FROM jc JOIN w ON w.rk = jc.rk GROUP BY jc.qid),
         | nr AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel
         |       FROM ex GROUP BY qid)
         |SELECT d.qid, nr.n_rel, CAST(d.dcg AS BIGINT) AS dcg_micro,
         | CAST(iw.idcg AS BIGINT) AS idcg_micro,
         | CAST((d.dcg * 1000000) // iw.idcg AS BIGINT) AS ndcg_ppm,
         | CAST(d.fh AS BIGINT) AS first_hit_rank,
         | CAST(coalesce(1000000 // d.fh, 0) AS BIGINT) AS rr_ppm,
         | CAST(coalesce(d.ap_sum, 0) // least(10, nr.n_rel) AS BIGINT)
         |   AS ap_ppm
         |FROM d JOIN nr ON d.qid = nr.qid
         | JOIN iw ON iw.nr = least(10, nr.n_rel)
         |ORDER BY d.qid""".stripMargin,

    // post-stratified delta (per-stratum floor then size-weighted
    // recombination) + the SRM chi-square goodness-of-fit guardrail
    "q282_stratified_readout" ->
      """WITH u AS (SELECT CAST(user_id AS VARCHAR) AS unit,
        |   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS uv,
        |   min(event_type) AS s
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND event_type IS NOT NULL GROUP BY 1),
        | a AS (SELECT uv, s,
        |   ('0x'||substr(md5('7:'||unit),1,8))::BIGINT % 2 AS arm FROM u),
        | c AS (SELECT s,
        |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
        |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS nc,
        |   CAST(sum(CASE WHEN arm = 1 THEN uv ELSE 0 END) AS HUGEINT) AS st,
        |   CAST(sum(CASE WHEN arm = 0 THEN uv ELSE 0 END) AS HUGEINT) AS sc
        |  FROM a GROUP BY 1),
        | d AS (SELECT s, nt, nc, st, sc, nt > 0 AND nc > 0 AS ok,
        |   CASE WHEN nt > 0 AND nc > 0 THEN
        |     ((st * nc - sc * nt) * 1000) // (nt * nc) END AS d_milli
        |  FROM c),
        | g AS (SELECT sum(nt + nc) AS n_units, sum(nt) AS n_t,
        |   sum(nc) AS n_c, sum(st) AS sy_t, sum(sc) AS sy_c,
        |   CAST(count(*) AS BIGINT) AS n_strata,
        |   CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
        |     AS n_strata_excluded,
        |   sum(CASE WHEN ok THEN nt + nc END) AS n_inc,
        |   sum(CASE WHEN ok THEN (nt + nc) * d_milli END) AS wsum
        |  FROM d)
        |SELECT CAST(n_units AS BIGINT) AS n_units,
        | CAST(n_t AS BIGINT) AS n_treat, CAST(n_c AS BIGINT) AS n_control,
        | n_strata, n_strata_excluded,
        | CAST(CASE WHEN n_t > 0 AND n_c > 0 THEN
        |   ((sy_t * n_c - sy_c * n_t) * 1000) // (n_t * n_c) END
        |   AS BIGINT) AS delta_raw_milli,
        | CAST(CASE WHEN n_inc > 0 THEN wsum // n_inc END AS BIGINT)
        |   AS delta_post_milli,
        | CAST(CASE WHEN n_units > 0 THEN
        |   ((n_t - n_c) * (n_t - n_c) * 1000) // n_units END AS BIGINT)
        |   AS srm_chi2_milli,
        | CASE WHEN n_units > 0 THEN
        |   ((n_t - n_c) * (n_t - n_c) * 1000) // n_units >= 3841 END
        |   AS srm_suspect
        |FROM g ORDER BY n_units""".stripMargin,

    // Qini deciles: ntile over the total (score DESC, unit) order,
    // cumulative cells, cleared incremental-conversion readout
    "q283_uplift_deciles" -> upliftNtileSql,

    // the histogram-rank twin reproduces the SAME ntile oracle
    "q321_uplift_hist" -> upliftNtileSql,

    // jackknife ratio SE: LOO ratios floored once per fold, the
    // cross-multiplied variance (B-1)*sum((r*B - S)^2) // B^3, exact
    // +-1-corrected isqrt, normal 95% interval
    "q284_jackknife_ratio" ->
      """WITH u AS (SELECT CAST(user_id AS VARCHAR) AS unit,
        |   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
        |   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE user_id IS NOT NULL),
        | c AS (SELECT
        |   ('0x'||substr(md5('23:'||unit),1,8))::BIGINT % 50 AS b,
        |   CAST(sum(x) AS HUGEINT) AS nb, CAST(sum(y) AS HUGEINT) AS db
        |  FROM u GROUP BY 1),
        | t AS (SELECT sum(nb) AS nn, sum(db) AS dd FROM c),
        | lo AS (SELECT
        |   CASE WHEN dd - db > 0 THEN ((nn - nb) * 1000000) // (dd - db)
        |   END AS r
        |  FROM c CROSS JOIN t),
        | s AS (SELECT sum(r) AS sr, CAST(count(r) AS HUGEINT) AS beff
        |  FROM lo WHERE r IS NOT NULL),
        | q AS (SELECT sum((lo.r * s.beff - s.sr) * (lo.r * s.beff - s.sr))
        |     AS sq, max(s.beff) AS beff, max(s.sr) AS sr
        |  FROM lo CROSS JOIN s WHERE lo.r IS NOT NULL),
        | f AS (SELECT q.beff, q.sq, t.nn, t.dd,
        |   CASE WHEN t.dd > 0 THEN (t.nn * 1000000) // t.dd END AS ratio,
        |   CASE WHEN q.beff >= 2 THEN ((q.beff - 1) * q.sq)
        |     // (q.beff * q.beff * q.beff) END AS v
        |  FROM q CROSS JOIN t),
        | g AS (SELECT f.*, CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT)
        |   AS c0 FROM f),
        | h AS (SELECT g.*,
        |   CASE WHEN v IS NULL THEN NULL
        |    WHEN CAST(c0 + 1 AS HUGEINT) * (c0 + 1) <= v THEN c0 + 1
        |    WHEN CAST(c0 AS HUGEINT) * c0 > v THEN c0 - 1
        |    ELSE c0 END AS se FROM g)
        |SELECT CAST(nn AS BIGINT) AS numerator,
        | CAST(dd AS BIGINT) AS denominator,
        | CAST(ratio AS BIGINT) AS ratio_ppm,
        | CAST(beff AS BIGINT) AS n_buckets,
        | CAST(se AS BIGINT) AS se_ppm,
        | CAST(ratio - (196 * se) // 100 AS BIGINT) AS ci_lo_ppm,
        | CAST(ratio + (196 * se) // 100 AS BIGINT) AS ci_hi_ppm
        |FROM h ORDER BY numerator""".stripMargin,

    // contribution analysis: exact per-segment period deltas + signed
    // ppm shares of the total move, largest absolute mover first
    "q285_delta_attribution" ->
      """WITH e AS (SELECT event_type AS segment,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL
        |    AND event_type IS NOT NULL),
        | mx AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
        | c AS (SELECT segment,
        |   CAST(sum(CASE WHEN day > mid THEN 0 ELSE cents END) AS BIGINT)
        |     AS val_a,
        |   CAST(sum(CASE WHEN day > mid THEN cents ELSE 0 END) AS BIGINT)
        |     AS val_b
        |  FROM e CROSS JOIN mx GROUP BY 1),
        | d AS (SELECT segment, val_a, val_b, val_b - val_a AS delta FROM c),
        | t AS (SELECT CAST(sum(delta) AS BIGINT) AS total_delta FROM d)
        |SELECT segment, val_a, val_b, delta, total_delta,
        | CAST(CASE WHEN total_delta != 0 THEN
        |   (CAST(delta AS HUGEINT) * 1000000) // total_delta END AS BIGINT)
        |   AS share_ppm
        |FROM d CROSS JOIN t
        |ORDER BY abs(delta) DESC, segment""".stripMargin,

    // intervention impact: conformal calibration width (rank 14 of 14)
    // times the post window as the band; signed cumulative effect and
    // cleared relative effect
    "q286_intervention_impact" ->
      """WITH daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | mx AS (SELECT max(day) AS dmax FROM daily),
        | cal AS (SELECT k.key, gs.day
        |  FROM (SELECT DISTINCT key FROM daily) k,
        |   (SELECT unnest(generate_series((SELECT dmax FROM mx) - 20,
        |      (SELECT dmax FROM mx) - 7)) AS day) gs),
        | cr AS (SELECT g.key, g.day,
        |   abs(coalesce(a.y, 0) - coalesce(p.y, 0)) AS r
        |  FROM cal g
        |   LEFT JOIN daily a ON a.key = g.key AND a.day = g.day
        |   LEFT JOIN daily p ON p.key = g.key AND p.day = g.day - 7),
        | rk AS (SELECT key, r,
        |   row_number() OVER (PARTITION BY key ORDER BY r, day) AS rn
        |  FROM cr),
        | qh AS (SELECT key, r AS width FROM rk WHERE rn = 14),
        | te AS (SELECT k.key, gs.day
        |  FROM (SELECT DISTINCT key FROM daily) k,
        |   (SELECT unnest(generate_series((SELECT dmax FROM mx) - 6,
        |      (SELECT dmax FROM mx))) AS day) gs),
        | tr AS (SELECT g.key,
        |   coalesce(a.y, 0) AS a, coalesce(p.y, 0) AS f
        |  FROM te g
        |   LEFT JOIN daily a ON a.key = g.key AND a.day = g.day
        |   LEFT JOIN daily p ON p.key = g.key AND p.day = g.day - 7),
        | ag AS (SELECT tr.key, CAST(count(*) AS BIGINT) AS n_post,
        |   CAST(sum(a) AS BIGINT) AS actual_total,
        |   CAST(sum(f) AS BIGINT) AS forecast_total,
        |   CAST(sum(a - f) AS BIGINT) AS effect_total,
        |   max(qh.width) AS width
        |  FROM tr LEFT JOIN qh ON qh.key = tr.key GROUP BY 1)
        |SELECT key AS event_type, n_post, actual_total, forecast_total,
        | effect_total, CAST(width AS BIGINT) AS width,
        | CAST(width * 7 AS BIGINT) AS band,
        | CAST(CASE WHEN forecast_total > 0 THEN
        |   (CAST(effect_total AS HUGEINT) * 1000000) // forecast_total END
        |   AS BIGINT) AS rel_effect_ppm,
        | CASE WHEN width IS NOT NULL THEN abs(effect_total) > width * 7 END
        |   AS significant
        |FROM ag ORDER BY event_type""".stripMargin,

    // log-rank: per death-time O-E in micro lanes (one floor per step),
    // hypergeometric variance (one floor), cleared chi2_1 readout
    "q287_log_rank" ->
      """WITH b AS (SELECT CAST(user_id AS VARCHAR) AS unit,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        | sp AS (SELECT unit, min(day) AS dd0, max(day) AS dd1
        |  FROM b GROUP BY 1),
        | mx AS (SELECT max(day) AS max_day FROM b),
        | u AS (SELECT unit, dd1 - dd0 AS dur,
        |   CASE WHEN dd1 + 7 <= max_day THEN 1 ELSE 0 END AS death,
        |   ('0x'||substr(md5('7:'||unit),1,8))::BIGINT % 2 AS arm
        |  FROM sp CROSS JOIN mx),
        | ce AS (SELECT dur, arm, CAST(count(*) AS BIGINT) AS n_all,
        |   CAST(sum(death) AS BIGINT) AS n_death FROM u GROUP BY 1, 2),
        | gr AS (SELECT g.dur, g.arm,
        |   coalesce(ce.n_all, 0) AS n_all, coalesce(ce.n_death, 0) AS n_death
        |  FROM (SELECT d.dur, a.arm
        |        FROM (SELECT DISTINCT dur FROM ce) d,
        |         (SELECT unnest(generate_series(0, 1)) AS arm) a) g
        |   LEFT JOIN ce ON ce.dur = g.dur AND ce.arm = g.arm),
        | ra AS (SELECT dur, arm, n_death,
        |   sum(n_all) OVER (PARTITION BY arm ORDER BY dur DESC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nr
        |  FROM gr),
        | st AS (SELECT dur,
        |   max(CASE WHEN arm = 1 THEN nr END) AS n1,
        |   max(CASE WHEN arm = 0 THEN nr END) AS n0,
        |   max(CASE WHEN arm = 1 THEN n_death END) AS d1,
        |   max(CASE WHEN arm = 0 THEN n_death END) AS d0
        |  FROM ra GROUP BY 1),
        | sx AS (SELECT n1, n0, d1, d0, n1 + n0 AS n, d1 + d0 AS d
        |  FROM st WHERE d1 + d0 > 0 AND n1 + n0 > 1),
        | oe AS (SELECT
        |   CAST(sum(d1 * 1000000
        |     - (CAST(d AS HUGEINT) * n1 * 1000000) // n) AS BIGINT)
        |     AS oe_sum,
        |   CAST(sum((CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d) * 1000000)
        |     // (CAST(n AS HUGEINT) * n * (n - 1))) AS BIGINT) AS v_sum
        |  FROM sx),
        | at AS (SELECT
        |   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |   CAST(sum(CASE WHEN arm = 1 THEN death ELSE 0 END) AS BIGINT)
        |     AS dt,
        |   CAST(sum(CASE WHEN arm = 0 THEN death ELSE 0 END) AS BIGINT)
        |     AS dc
        |  FROM u)
        |SELECT n_t AS n_treat, n_c AS n_control, dt AS deaths_treat,
        | dc AS deaths_control, oe_sum AS oe_sum_micro,
        | v_sum AS var_sum_micro,
        | CAST(CASE WHEN v_sum > 0 THEN
        |   (CAST(oe_sum AS HUGEINT) * oe_sum * 1000)
        |   // (CAST(v_sum AS HUGEINT) * 1000000) END AS BIGINT)
        |   AS chi2_milli,
        | CASE WHEN v_sum > 0 THEN
        |   (CAST(oe_sum AS HUGEINT) * oe_sum * 1000)
        |   // (CAST(v_sum AS HUGEINT) * 1000000) >= 3841 END AS significant
        |FROM oe CROSS JOIN at ORDER BY n_treat""".stripMargin,

    // time-decay attribution: bit-shift halvings, proportional quotas,
    // largest-remainder conservation to exactly 1e6 per conversion
    "q288_timedecay_attribution" ->
      """WITH b AS (SELECT user_id AS u,
        |   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |   event_type AS et, event_id AS eid
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
        | convs AS (SELECT u, sec AS cs, eid AS cid FROM b
        |   WHERE et = 'purchase'),
        | tch AS (SELECT u, sec AS tsx, et AS channel, eid AS tid FROM b
        |   WHERE et <> 'purchase'),
        | j AS (SELECT c.cid, t.channel, t.tsx, t.tid,
        |   least((c.cs - t.tsx) // 600, 19) AS h
        |  FROM convs c JOIN tch t ON c.u = t.u
        |   AND t.tsx >= c.cs - 3600 AND t.tsx < c.cs),
        | w AS (SELECT cid, channel, tsx, tid,
        |   1000000 // (CAST(1 AS BIGINT) << CAST(h AS INT)) AS wt FROM j),
        | sums AS (SELECT cid, channel, tsx, tid, wt,
        |   sum(wt) OVER (PARTITION BY cid) AS sw FROM w),
        | q AS (SELECT cid, channel, tsx, tid,
        |   (1000000 * wt) // sw AS qt, (1000000 * wt) % sw AS r,
        |   1000000 - sum((1000000 * wt) // sw) OVER (PARTITION BY cid)
        |     AS lft
        |  FROM sums),
        | cr AS (SELECT channel,
        |   qt + CASE WHEN row_number() OVER (PARTITION BY cid
        |       ORDER BY r DESC, tsx DESC, tid) <= lft
        |     THEN 1 ELSE 0 END AS credit
        |  FROM q),
        | by_ch AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |   CAST(sum(credit) AS BIGINT) AS credit_ppm
        |  FROM cr GROUP BY channel),
        | direct AS (SELECT '__direct__' AS channel,
        |   CAST(count(*) AS BIGINT) AS n_touches,
        |   CAST(count(*) * 1000000 AS BIGINT) AS credit_ppm
        |  FROM convs WHERE cid NOT IN (SELECT DISTINCT cid FROM j)
        |  HAVING count(*) > 0)
        |SELECT * FROM by_ch UNION ALL SELECT * FROM direct
        |ORDER BY channel""".stripMargin,

    // Holt smoothing: the milli-lane level/trend recurrence replayed
    // step by step with a recursive CTE over the gap-filled series
    "q289_holt_forecast" ->
      """WITH RECURSIVE daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | sp AS (SELECT key, min(day) AS dd0, max(day) AS dd1
        |  FROM daily GROUP BY 1),
        | g AS (SELECT sp.key, gs.day,
        |   CAST(gs.day - sp.dd0 + 1 AS BIGINT) AS i
        |  FROM sp, unnest(generate_series(sp.dd0, sp.dd1)) AS gs(day)),
        | se AS (SELECT g.key, g.i, coalesce(d.y, 0) AS y
        |  FROM g LEFT JOIN daily d ON d.key = g.key AND d.day = g.day),
        | nn AS (SELECT key, CAST(max(i) AS BIGINT) AS n_days FROM se
        |  GROUP BY 1),
        | rec AS (
        |  SELECT key, i, y * 1000 AS l, CAST(0 AS BIGINT) AS b,
        |    CAST(0 AS BIGINT) AS sae
        |  FROM se WHERE i = 1
        |  UNION ALL
        |  SELECT se.key, se.i,
        |    (300000 * se.y * 1000 + 700000 * (rec.l + rec.b)) // 1000000,
        |    (100000 * ((300000 * se.y * 1000 + 700000 * (rec.l + rec.b))
        |        // 1000000 - rec.l)
        |      + 900000 * rec.b) // 1000000,
        |    rec.sae + abs(se.y * 1000 - (rec.l + rec.b))
        |  FROM se JOIN rec ON se.key = rec.key AND se.i = rec.i + 1),
        | fin AS (SELECT rec.key, rec.l, rec.b, rec.sae
        |  FROM rec JOIN nn ON nn.key = rec.key AND rec.i = nn.n_days)
        |SELECT fin.key AS event_type, CAST(h.h AS BIGINT) AS h,
        | nn.n_days, CAST(fin.l AS BIGINT) AS level_milli,
        | CAST(fin.b AS BIGINT) AS trend_milli,
        | CAST(fin.sae AS BIGINT) AS sae_milli,
        | CAST(fin.l + h.h * fin.b AS BIGINT) AS forecast_milli
        |FROM fin JOIN nn ON nn.key = fin.key
        | CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS h) h
        |ORDER BY event_type, h""".stripMargin,

    // peeking-safe trajectory: cumulative daily 2x2 cells, cleared chi2
    // per look, Bonferroni threshold picked by total look count
    "q290_ab_trajectory" ->
      """WITH u AS (SELECT CAST(user_id AS VARCHAR) AS unit,
        |   min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS entry_day,
        |   min(CASE WHEN event_type = 'purchase'
        |     THEN CAST(floor(epoch(ts)) AS BIGINT) // 86400 END) AS conv_day
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL
        |  GROUP BY 1),
        | a AS (SELECT entry_day, conv_day,
        |   ('0x'||substr(md5('7:'||unit),1,8))::BIGINT % 2 AS arm FROM u),
        | bd AS (SELECT min(entry_day) AS d0,
        |   max(greatest(entry_day, coalesce(conv_day, entry_day))) AS d1
        |  FROM a),
        | ent AS (SELECT arm, entry_day AS day, CAST(count(*) AS BIGINT)
        |   AS n_ent FROM a GROUP BY 1, 2),
        | cnv AS (SELECT arm, conv_day AS day, CAST(count(*) AS BIGINT)
        |   AS n_cnv FROM a WHERE conv_day IS NOT NULL GROUP BY 1, 2),
        | g AS (SELECT gs.day, ar.arm
        |  FROM bd, unnest(generate_series(bd.d0, bd.d1)) AS gs(day),
        |   (SELECT unnest(generate_series(0, 1)) AS arm) ar),
        | run AS (SELECT g.day, g.arm,
        |   sum(coalesce(ent.n_ent, 0)) OVER w AS n_cum,
        |   sum(coalesce(cnv.n_cnv, 0)) OVER w AS c_cum
        |  FROM g LEFT JOIN ent ON ent.arm = g.arm AND ent.day = g.day
        |   LEFT JOIN cnv ON cnv.arm = g.arm AND cnv.day = g.day
        |  WINDOW w AS (PARTITION BY g.arm ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        | byd AS (SELECT day,
        |   CAST(max(CASE WHEN arm = 1 THEN c_cum END) AS BIGINT) AS a,
        |   CAST(max(CASE WHEN arm = 1 THEN n_cum - c_cum END) AS BIGINT)
        |     AS b,
        |   CAST(max(CASE WHEN arm = 0 THEN c_cum END) AS BIGINT) AS c,
        |   CAST(max(CASE WHEN arm = 0 THEN n_cum - c_cum END) AS BIGINT)
        |     AS d,
        |   count(*) OVER () AS n_looks
        |  FROM run GROUP BY day),
        | th AS (SELECT * FROM (VALUES (1,3841),(2,5024),(3,5731),(4,6239),
        |   (5,6635),(6,6960),(7,7237),(8,7477),(9,7689),(10,7879),
        |   (11,8052),(12,8210),(13,8355),(14,8490),(15,8615),(16,8733),
        |   (17,8844),(18,8948),(19,9047),(20,9141),(21,9230),(22,9315),
        |   (23,9397),(24,9475),(25,9550),(26,9622),(27,9691),(28,9758),
        |   (29,9822),(30,9885),(31,9945),(32,10003),(33,10060),(34,10115),
        |   (35,10169),(36,10220),(37,10271),(38,10320),(39,10368),
        |   (40,10415)) AS t(k, thr)),
        | fin AS (SELECT byd.*, th.thr,
        |   CASE WHEN (a+b) > 0 AND (c+d) > 0 AND (a+c) > 0 AND (b+d) > 0
        |     AND (a+b+c+d) <= 10000000 THEN
        |     CAST((CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c)
        |       * (CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c)
        |       * (a+b+c+d) * 1000
        |       // (CAST(a+b AS HUGEINT) * (c+d) * (a+c) * (b+d)) AS BIGINT)
        |   END AS chi2
        |  FROM byd LEFT JOIN th ON th.k = byd.n_looks)
        |SELECT day, a + b AS n_treat, c + d AS n_control,
        | a AS conv_treat, c AS conv_control, chi2 AS chi2_milli,
        | CAST(thr AS BIGINT) AS threshold_milli,
        | CASE WHEN chi2 IS NOT NULL AND thr IS NOT NULL
        |   THEN chi2 >= thr END AS significant
        |FROM fin ORDER BY day""".stripMargin,

    // winsorized mean: exact rank-selected decile bounds, clamp, count
    // the clamps, truncating integer mean
    "q291_winsorized_mean" ->
      """WITH b AS (SELECT event_type AS key,
        |   CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        | r AS (SELECT key, v,
        |   row_number() OVER (PARTITION BY key ORDER BY v) AS rn,
        |   count(*) OVER (PARTITION BY key) AS n FROM b),
        | t AS (SELECT key, v, rn, n, (n * 1) // 10 AS tt FROM r),
        | bx AS (SELECT key, v, n,
        |   max(CASE WHEN rn = tt + 1 THEN v END) OVER (PARTITION BY key)
        |     AS lo,
        |   max(CASE WHEN rn = n - tt THEN v END) OVER (PARTITION BY key)
        |     AS hi
        |  FROM t),
        | w AS (SELECT key, n, lo, hi,
        |   greatest(lo, least(hi, v)) AS wv, v FROM bx)
        |SELECT key AS event_type, CAST(max(n) AS BIGINT) AS n,
        | CAST(max(lo) AS BIGINT) AS lo_bound,
        | CAST(max(hi) AS BIGINT) AS hi_bound,
        | CAST(sum(CASE WHEN wv <> v THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_clamped,
        | CAST(sum(wv) // count(*) AS BIGINT) AS winsorized_mean
        |FROM w GROUP BY key ORDER BY event_type""".stripMargin,

    // resource-allocation link prediction: wedge pairs at cap-eligible
    // apexes, 1e6 // deg weights, existing edges anti-joined out,
    // deterministic top-1000
    "q292_link_prediction" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        | raw AS (SELECT doc_id AS src, (doc_id*7+1) % nn.n AS dst FROM documents, nn
        |   UNION ALL SELECT doc_id, (doc_id*13+5) % nn.n FROM documents, nn
        |   UNION ALL SELECT doc_id, (doc_id*31+11) % nn.n FROM documents, nn),
        | und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |   FROM raw WHERE src <> dst),
        | adj AS (SELECT u AS apex, v AS nb FROM und
        |   UNION ALL SELECT v, u FROM und),
        | deg AS (SELECT apex, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
        | elig AS (SELECT adj.apex, adj.nb, 1000000 // deg.d AS w
        |   FROM adj JOIN deg ON adj.apex = deg.apex
        |   WHERE deg.d BETWEEN 2 AND 64),
        | wedges AS (SELECT a.nb AS node_a, b.nb AS node_b,
        |     CAST(count(*) AS BIGINT) AS n_common,
        |     CAST(sum(a.w) AS BIGINT) AS ra_ppm
        |   FROM elig a JOIN elig b ON a.apex = b.apex AND a.nb < b.nb
        |   GROUP BY 1, 2)
        |SELECT w.node_a, w.node_b, w.n_common, w.ra_ppm FROM wedges w
        |WHERE NOT EXISTS (SELECT 1 FROM und
        |  WHERE und.u = w.node_a AND und.v = w.node_b)
        |ORDER BY ra_ppm DESC, node_a, node_b LIMIT 1000""".stripMargin,

    "q293_kcore" -> q293Sql,

    // ACF in ppm over n-scaled centered daily counts (no mean division);
    // HUGEINT lanes replay the operator's DECIMAL(38,0) products
    "q294_acf" ->
      """WITH daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | sp AS (SELECT key, min(day) AS d0, max(day) AS d1 FROM daily
        |  GROUP BY 1 HAVING max(day) - min(day) < 100000),
        | g AS (SELECT sp.key, gs.day, CAST(gs.day - sp.d0 + 1 AS BIGINT) AS i
        |  FROM sp, unnest(generate_series(sp.d0, sp.d1)) AS gs(day)),
        | se AS (SELECT g.key, g.i, coalesce(d.y, 0) AS y
        |  FROM g LEFT JOIN daily d ON d.key = g.key AND d.day = g.day),
        | st AS (SELECT key, CAST(max(i) AS BIGINT) AS n_days,
        |   CAST(sum(y) AS HUGEINT) AS s FROM se GROUP BY 1),
        | c AS (SELECT se.key, se.i, st.n_days,
        |   CAST(st.n_days AS HUGEINT) * se.y - st.s AS cv
        |  FROM se JOIN st ON st.key = se.key),
        | den AS (SELECT key, sum(cv * cv) AS dn FROM c GROUP BY 1),
        | lg AS (SELECT unnest(generate_series(1, 7)) AS lag),
        | num AS (SELECT a.key, lg.lag, sum(a.cv * b.cv) AS nm
        |  FROM c a CROSS JOIN lg
        |  JOIN c b ON b.key = a.key AND b.i = a.i + lg.lag
        |  GROUP BY 1, 2)
        |SELECT st.key AS event_type, CAST(num.lag AS BIGINT) AS lag, st.n_days,
        | CAST(CASE WHEN den.dn > 0 THEN (num.nm * 1000000) // den.dn END
        |   AS BIGINT) AS acf_ppm
        |FROM num JOIN st ON st.key = num.key JOIN den ON den.key = num.key
        |WHERE num.lag < st.n_days
        |ORDER BY event_type, lag""".stripMargin,

    "q295_holt_winters" -> q295Sql,

    // Croston recurrence: (z, p, gap, nd) lanes in a recursive CTE
    // (NOT list_reduce — see q295Sql note on its mutating accumulator)
    "q296_croston" ->
      """WITH RECURSIVE daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value > 250
        |  GROUP BY 1, 2),
        | sp AS (SELECT key, min(day) AS d0, max(day) AS d1 FROM daily
        |  GROUP BY 1 HAVING max(day) - min(day) < 100000),
        | g AS (SELECT sp.key, gs.day, CAST(gs.day - sp.d0 + 1 AS BIGINT) AS i
        |  FROM sp, unnest(generate_series(sp.d0, sp.d1)) AS gs(day)),
        | se AS (SELECT g.key, g.i, coalesce(d.y, 0) AS y
        |  FROM g LEFT JOIN daily d ON d.key = g.key AND d.day = g.day),
        | nn2 AS (SELECT key, CAST(max(i) AS BIGINT) AS n_days FROM se GROUP BY 1),
        | rec AS (
        |  SELECT key, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS z,
        |    CAST(0 AS BIGINT) AS p, CAST(1 AS BIGINT) AS gap,
        |    CAST(0 AS BIGINT) AS nd
        |  FROM nn2
        |  UNION ALL
        |  SELECT se.key, se.i,
        |    CASE WHEN se.y > 0 THEN
        |      CASE WHEN rec.nd = 0 THEN se.y * 1000
        |        ELSE (200000 * se.y * 1000 + 800000 * rec.z) // 1000000 END
        |      ELSE rec.z END,
        |    CASE WHEN se.y > 0 THEN
        |      CASE WHEN rec.nd = 0 THEN rec.gap * 1000
        |        ELSE (200000 * rec.gap * 1000 + 800000 * rec.p) // 1000000 END
        |      ELSE rec.p END,
        |    CASE WHEN se.y > 0 THEN 1 ELSE rec.gap + 1 END,
        |    CASE WHEN se.y > 0 THEN rec.nd + 1 ELSE rec.nd END
        |  FROM se JOIN rec ON se.key = rec.key AND se.i = rec.i + 1)
        |SELECT rec.key AS event_type, nn2.n_days, rec.nd AS n_demand,
        | CASE WHEN rec.nd > 0 THEN rec.z END AS z_milli,
        | CASE WHEN rec.nd > 0 THEN rec.p END AS p_milli,
        | CASE WHEN rec.nd > 0 AND rec.p > 0 THEN (rec.z * 1000) // rec.p END
        |   AS forecast_milli
        |FROM rec JOIN nn2 ON nn2.key = rec.key AND rec.i = nn2.n_days
        |ORDER BY event_type""".stripMargin,

    // one-way ANOVA from (n_g, S_g, Q_g) sufficient statistics, the
    // operator's documented per-group floor replayed verbatim
    "q297_anova" ->
      """WITH e AS (SELECT event_type AS key,
        |   ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7 AS grp,
        |   CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL),
        | g AS (SELECT key, grp, CAST(count(*) AS BIGINT) AS ng,
        |   CAST(sum(v) AS HUGEINT) AS sg, sum(CAST(v AS HUGEINT) * v) AS qg
        |  FROM e GROUP BY 1, 2),
        | t AS (SELECT key, CAST(count(*) AS BIGINT) AS k_groups,
        |   CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS HUGEINT) AS s,
        |   CAST(sum(qg) AS HUGEINT) AS q,
        |   CAST(sum((sg * sg) // ng) AS HUGEINT) AS gsum FROM g GROUP BY 1),
        | v2 AS (SELECT key, k_groups, n,
        |   greatest(gsum - (s * s) // n, CAST(0 AS HUGEINT)) AS bet,
        |   q - gsum AS wit FROM t)
        |SELECT key AS event_type, k_groups, n,
        | CAST(CASE WHEN k_groups >= 2 AND wit > 0 THEN
        |   (bet * (n - k_groups) * 1000) // (wit * (k_groups - 1)) END
        |   AS BIGINT) AS f_milli,
        | CAST(CASE WHEN bet + wit > 0 THEN (bet * 1000000) // (bet + wit) END
        |   AS BIGINT) AS eta2_ppm
        |FROM v2 ORDER BY event_type""".stripMargin,

    // Cochran-Armitage: exact integer N_t and variance product, cleared
    // z-squared with the abChiSquare n <= 1e7 exactness guard
    "q298_trend_test" ->
      """WITH e AS (SELECT event_type AS key,
        |   (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 21600 AS w,
        |   CASE WHEN value > 35 THEN 1 ELSE 0 END AS y
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL),
        | l AS (SELECT key, w, CAST(count(*) AS BIGINT) AS ni,
        |   CAST(sum(y) AS BIGINT) AS ri FROM e GROUP BY 1, 2),
        | t AS (SELECT key, CAST(count(*) AS BIGINT) AS n_levels,
        |   CAST(sum(ni) AS BIGINT) AS n, CAST(sum(ri) AS BIGINT) AS successes,
        |   CAST(sum(CAST(w AS HUGEINT) * ri) AS HUGEINT) AS swr,
        |   CAST(sum(CAST(w AS HUGEINT) * ni) AS HUGEINT) AS aa,
        |   CAST(sum(CAST(w AS HUGEINT) * w * ni) AS HUGEINT) AS bb
        |  FROM l GROUP BY 1),
        | v AS (SELECT key, n_levels, n, successes,
        |   CAST(n AS HUGEINT) * swr - CAST(successes AS HUGEINT) * aa AS nt,
        |   CAST(successes AS HUGEINT) * (n - successes)
        |     * (CAST(n AS HUGEINT) * bb - aa * aa) AS vr FROM t)
        |SELECT key AS event_type, n, n_levels, successes,
        | CAST(CASE WHEN n_levels >= 2 AND vr > 0 AND n <= 10000000 THEN
        |   (CASE WHEN nt < 0 THEN -1 ELSE 1 END)
        |     * ((nt * nt * n * 1000) // vr) END AS BIGINT) AS z2_signed_milli,
        | CASE WHEN n_levels >= 2 AND vr > 0 AND n <= 10000000 THEN
        |   10000 * nt * nt * n > 38416 * vr END AS significant
        |FROM v ORDER BY event_type""".stripMargin,

    // Mann-Kendall: pairwise sign sum + tie-corrected variance x18,
    // continuity-corrected cleared z-squared
    "q299_mann_kendall" ->
      """WITH daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | sp AS (SELECT key, min(day) AS d0, max(day) AS d1 FROM daily
        |  GROUP BY 1 HAVING max(day) - min(day) < 100000),
        | g AS (SELECT sp.key, gs.day, CAST(gs.day - sp.d0 + 1 AS BIGINT) AS i
        |  FROM sp, unnest(generate_series(sp.d0, sp.d1)) AS gs(day)),
        | se AS (SELECT g.key, g.i, coalesce(d.y, 0) AS y
        |  FROM g LEFT JOIN daily d ON d.key = g.key AND d.day = g.day),
        | nn2 AS (SELECT key, CAST(max(i) AS BIGINT) AS n_days FROM se
        |  GROUP BY 1 HAVING max(i) >= 2),
        | s AS (SELECT a.key, CAST(sum(sign(b.y - a.y)) AS BIGINT) AS s_stat
        |  FROM se a JOIN se b ON b.key = a.key AND b.i > a.i GROUP BY 1),
        | ties AS (SELECT key, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
        |   AS tie FROM (SELECT key, y, CAST(count(*) AS BIGINT) AS t
        |   FROM se GROUP BY 1, 2) GROUP BY 1),
        | v AS (SELECT nn2.key, nn2.n_days, s.s_stat,
        |   nn2.n_days * (nn2.n_days - 1) * (2 * nn2.n_days + 5) - ties.tie
        |     AS var18
        |  FROM nn2 JOIN s ON s.key = nn2.key JOIN ties ON ties.key = nn2.key)
        |SELECT key AS event_type, n_days, s_stat, var18,
        | CAST(CASE WHEN var18 > 0 THEN CAST(sign(s_stat) AS BIGINT)
        |   * ((18000 * CAST(abs(s_stat) - 1 AS HUGEINT)
        |       * (abs(s_stat) - 1)) // var18) END
        |   AS BIGINT) AS z2_signed_milli,
        | COALESCE(var18 > 0 AND abs(s_stat) > 1
        |   AND 180000 * CAST(abs(s_stat) - 1 AS HUGEINT) * (abs(s_stat) - 1)
        |     > 38416 * CAST(var18 AS HUGEINT),
        |   false) AS significant
        |FROM v ORDER BY event_type""".stripMargin,

    // duplicate-trigram exposure: corpus doc-frequency per shingle hash,
    // per-doc dup share in ppm (the q35 shingle+hash conventions)
    "q300_dup_ngram_rate" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         | sh AS (SELECT doc_id AS id, unnest($trigrams) AS sh FROM d),
         | hb AS (SELECT id, ('0x'||substr(md5('0:'||sh),1,8))::BIGINT AS h FROM sh),
         | dup AS (SELECT h FROM hb GROUP BY h HAVING count(*) >= 2),
         | sz AS (SELECT id, CAST(count(*) AS BIGINT) AS n_shingles FROM sh GROUP BY 1),
         | nd AS (SELECT id, CAST(count(*) AS BIGINT) AS n_dup FROM hb
         |   WHERE h IN (SELECT h FROM dup) GROUP BY 1)
         |SELECT sz.id AS doc_id, sz.n_shingles,
         | COALESCE(nd.n_dup, 0) AS n_dup,
         | (COALESCE(nd.n_dup, 0) * 1000000) // sz.n_shingles AS dup_ppm
         |FROM sz LEFT JOIN nd ON nd.id = sz.id
         |WHERE sz.n_shingles > 0 ORDER BY doc_id""".stripMargin,

    "q302_label_prop" -> q302Sql,

    "q305_kcenter_coreset" -> q305Sql,

    "q308_markov_attribution" -> q308Sql,

    "q312_markov_bucketed" -> q312Sql,

    // Hyndman strength features over the q306 decomposition: n-scaled
    // variance ratios of the milli components, one truncating // per
    // strength, clamped at 0, NULL on zero denominator variance
    "q313_seasonal_strength" ->
      """WITH daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | sp AS (SELECT key, min(day) AS d0, max(day) AS d1 FROM daily
        |  GROUP BY 1 HAVING max(day) - min(day) < 100000),
        | g AS (SELECT sp.key, gs.day, CAST(gs.day - sp.d0 + 1 AS BIGINT) AS i
        |  FROM sp, unnest(generate_series(sp.d0, sp.d1)) AS gs(day)),
        | se AS (SELECT g.key, g.i, coalesce(d.y, 0) AS y
        |  FROM g LEFT JOIN daily d ON d.key = g.key AND d.day = g.day),
        | t AS (SELECT key, i, y,
        |   CASE WHEN count(*) OVER w = 7
        |     THEN CAST(sum(y * 1000) OVER w // 7 AS BIGINT) END AS trend
        |  FROM se WINDOW w AS (PARTITION BY key ORDER BY i
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        | dtr AS (SELECT key, (i - 1) % 7 AS slot, y * 1000 - trend AS det
        |  FROM t WHERE trend IS NOT NULL),
        | seas AS (SELECT key, slot,
        |   CAST(sum(det) // count(*) AS BIGINT) AS seasonal
        |  FROM dtr GROUP BY 1, 2),
        | comp AS (SELECT t.key,
        |   t.y * 1000 - t.trend - seas.seasonal AS r,
        |   t.y * 1000 - t.trend AS dt,
        |   t.y * 1000 - seas.seasonal AS ds
        |  FROM t JOIN seas ON seas.key = t.key AND seas.slot = (t.i - 1) % 7
        |  WHERE t.trend IS NOT NULL),
        | agg AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(r) AS HUGEINT) AS sr, sum(CAST(r AS HUGEINT) * r) AS qr,
        |   CAST(sum(dt) AS HUGEINT) AS sdt,
        |   sum(CAST(dt AS HUGEINT) * dt) AS qdt,
        |   CAST(sum(ds) AS HUGEINT) AS sds,
        |   sum(CAST(ds AS HUGEINT) * ds) AS qds
        |  FROM comp GROUP BY 1),
        | v AS (SELECT key, n, n * qr - sr * sr AS vr,
        |   n * qdt - sdt * sdt AS vdt, n * qds - sds * sds AS vds FROM agg)
        |SELECT key AS event_type, n,
        | CAST(CASE WHEN vds > 0 THEN
        |   greatest(1000000 - (vr * 1000000) // vds, 0) END
        |   AS BIGINT) AS strength_trend_ppm,
        | CAST(CASE WHEN vdt > 0 THEN
        |   greatest(1000000 - (vr * 1000000) // vdt, 0) END
        |   AS BIGINT) AS strength_seasonal_ppm
        |FROM v ORDER BY event_type""".stripMargin,

    // Wald-Wolfowitz runs: lower-median dichotomization (equal days
    // dropped), runs via lag, cleared z-squared in HUGEINT lanes; keys
    // with every day at the median keep a (0,0,0,NULL,false) row
    "q314_runs_test" ->
      """WITH daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | sp AS (SELECT key, min(day) AS d0, max(day) AS d1 FROM daily
        |  GROUP BY 1 HAVING max(day) - min(day) < 100000),
        | g AS (SELECT sp.key, gs.day, CAST(gs.day - sp.d0 + 1 AS BIGINT) AS i
        |  FROM sp, unnest(generate_series(sp.d0, sp.d1)) AS gs(day)),
        | se AS MATERIALIZED (SELECT g.key, g.i, coalesce(d.y, 0) AS y
        |  FROM g LEFT JOIN daily d ON d.key = g.key AND d.day = g.day),
        | nn2 AS (SELECT key, CAST(max(i) AS BIGINT) AS n_days FROM se GROUP BY 1),
        | med AS (SELECT key, y AS med FROM (
        |   SELECT key, y, row_number() OVER (PARTITION BY key ORDER BY y) AS rn,
        |     count(*) OVER (PARTITION BY key) AS m FROM se)
        |  WHERE rn = (m + 1) // 2),
        | sgn AS (SELECT se.key, se.i,
        |   CASE WHEN se.y > med.med THEN 1 ELSE -1 END AS s
        |  FROM se JOIN med ON med.key = se.key WHERE se.y <> med.med),
        | srk AS (SELECT key, s,
        |   lag(s) OVER (PARTITION BY key ORDER BY i) AS prev FROM sgn),
        | st AS (SELECT key,
        |   CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |   CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
        |   CAST(1 + sum(CASE WHEN prev IS NOT NULL AND s <> prev
        |     THEN 1 ELSE 0 END) AS BIGINT) AS runs
        |  FROM srk GROUP BY 1),
        | v AS (SELECT nn2.key, nn2.n_days,
        |   COALESCE(st.n_above, 0) AS n_above,
        |   COALESCE(st.n_below, 0) AS n_below,
        |   COALESCE(st.runs, 0) AS runs,
        |   COALESCE(st.n_above, 0) + COALESCE(st.n_below, 0) AS nnx,
        |   2 * COALESCE(st.n_above, 0) * COALESCE(st.n_below, 0) AS ax
        |  FROM nn2 LEFT JOIN st ON st.key = nn2.key),
        | w AS (SELECT *, runs * nnx - nnx - ax AS dx FROM v)
        |SELECT key AS event_type, n_days, n_above, n_below, runs,
        | CAST(CASE WHEN CAST(ax AS HUGEINT) * (ax - nnx) > 0 THEN
        |   CAST(sign(dx) AS BIGINT)
        |     * ((1000 * CAST(abs(dx) AS HUGEINT) * abs(dx) * (nnx - 1))
        |        // (CAST(ax AS HUGEINT) * (ax - nnx))) END
        |   AS BIGINT) AS z2_signed_milli,
        | COALESCE(CAST(ax AS HUGEINT) * (ax - nnx) > 0
        |   AND 10000 * CAST(abs(dx) AS HUGEINT) * abs(dx) * (nnx - 1)
        |     > 38416 * CAST(ax AS HUGEINT) * (ax - nnx), false) AS significant
        |FROM w ORDER BY event_type""".stripMargin,

    "q315_hits" -> q315Sql,

    "q316_modularity" -> q316Sql,

    // observed-coalition Shapley: journey channel sets -> floored ppm
    // coalition values -> per-member marginal DIV |S|, summed exactly;
    // unobserved sub-coalitions value 0 (the documented simplification)
    "q318_shapley" ->
      """WITH e AS (SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |   event_type AS et, event_id AS eid
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
        | cv AS (SELECT u, sec AS conv_sec, eid AS conv_id FROM (
        |   SELECT u, sec, eid,
        |     row_number() OVER (PARTITION BY u ORDER BY sec, eid) AS r
        |   FROM e WHERE et = 'purchase') WHERE r = 1),
        | tch AS (SELECT e.u, e.et, cv.conv_sec IS NOT NULL AS converted,
        |    row_number() OVER (PARTITION BY e.u ORDER BY e.sec, e.eid) AS rn
        |   FROM e LEFT JOIN cv ON cv.u = e.u
        |   WHERE e.et <> 'purchase' AND (cv.conv_sec IS NULL
        |     OR e.sec < cv.conv_sec
        |     OR (e.sec = cv.conv_sec AND e.eid < cv.conv_id))),
        | tc AS (SELECT * FROM tch WHERE rn <= 50),
        | sets AS (SELECT u, list_sort(list_distinct(list(et))) AS s,
        |   bool_or(converted) AS conv FROM tc GROUP BY 1),
        | vset AS MATERIALIZED (SELECT array_to_string(s, '|') AS sk,
        |   min(s) AS s, CAST(count(*) AS BIGINT) AS n_j,
        |   CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS nc
        |  FROM sets GROUP BY 1),
        | ex AS MATERIALIZED (SELECT sk, s, n_j, (nc * 1000000) // n_j AS v,
        |   unnest(s) AS channel FROM vset),
        | par AS (SELECT ex.channel, ex.n_j, ex.v, len(ex.s) AS sz,
        |   array_to_string(list_filter(ex.s, x -> x <> ex.channel), '|') AS pk
        |  FROM ex),
        | pj AS (SELECT par.channel, par.n_j,
        |   (par.v - COALESCE(v2.v, 0)) // par.sz AS contrib
        |  FROM par LEFT JOIN (SELECT sk, (nc * 1000000) // n_j AS v FROM vset)
        |    v2 ON v2.sk = par.pk),
        | agg AS (SELECT channel, CAST(sum(n_j) AS BIGINT) AS n_journeys,
        |   CAST(sum(n_j * contrib) AS BIGINT) AS credit_ppm FROM pj
        |  GROUP BY 1),
        | tot AS (SELECT CAST(sum(greatest(credit_ppm, 0)) AS BIGINT) AS pos
        |  FROM agg)
        |SELECT channel, n_journeys, credit_ppm,
        | CAST(CASE WHEN tot.pos > 0 THEN
        |   (greatest(credit_ppm, 0) * 1000000) // tot.pos END AS BIGINT)
        |   AS share_ppm
        |FROM agg CROSS JOIN tot ORDER BY channel""".stripMargin,

    // hostile-alphabet Shapley (q322): ground truth over LIST coalition
    // keys — the engine's percent-escaped string keys must agree, which
    // proves the escape injective rather than assuming it
    "q322_shapley_sanitized" ->
      """WITH e AS (SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |   CASE event_type WHEN 'click' THEN 'cl|ick' WHEN 'view' THEN ''
        |     WHEN 'signup' THEN 'sign%up' WHEN 'error' THEN '%E'
        |     ELSE event_type END AS et, event_id AS eid
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL AND event_id IS NOT NULL),
        | cv AS (SELECT u, sec AS conv_sec, eid AS conv_id FROM (
        |   SELECT u, sec, eid,
        |     row_number() OVER (PARTITION BY u ORDER BY sec, eid) AS r
        |   FROM e WHERE et = 'purchase') WHERE r = 1),
        | tch AS (SELECT e.u, e.et, cv.conv_sec IS NOT NULL AS converted,
        |    row_number() OVER (PARTITION BY e.u ORDER BY e.sec, e.eid) AS rn
        |   FROM e LEFT JOIN cv ON cv.u = e.u
        |   WHERE e.et <> 'purchase' AND (cv.conv_sec IS NULL
        |     OR e.sec < cv.conv_sec
        |     OR (e.sec = cv.conv_sec AND e.eid < cv.conv_id))),
        | tc AS (SELECT * FROM tch WHERE rn <= 50),
        | sets AS (SELECT u, list_sort(list_distinct(list(et))) AS s,
        |   bool_or(converted) AS conv FROM tc GROUP BY 1),
        | vset AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT) AS n_j,
        |   CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS nc
        |  FROM sets GROUP BY 1),
        | ex AS MATERIALIZED (SELECT s, n_j, (nc * 1000000) // n_j AS v,
        |   unnest(s) AS channel FROM vset),
        | par AS (SELECT ex.channel, ex.n_j, ex.v, len(ex.s) AS sz,
        |   list_filter(ex.s, x -> x <> ex.channel) AS pk FROM ex),
        | pj AS (SELECT par.channel, par.n_j,
        |   (par.v - COALESCE(v2.v, 0)) // par.sz AS contrib
        |  FROM par LEFT JOIN (SELECT s, (nc * 1000000) // n_j AS v FROM vset)
        |    v2 ON v2.s = par.pk),
        | agg AS (SELECT channel, CAST(sum(n_j) AS BIGINT) AS n_journeys,
        |   CAST(sum(n_j * contrib) AS BIGINT) AS credit_ppm FROM pj
        |  GROUP BY 1),
        | tot AS (SELECT CAST(sum(greatest(credit_ppm, 0)) AS BIGINT) AS pos
        |  FROM agg)
        |SELECT channel, n_journeys, credit_ppm,
        | CAST(CASE WHEN tot.pos > 0 THEN
        |   (greatest(credit_ppm, 0) * 1000000) // tot.pos END AS BIGINT)
        |   AS share_ppm
        |FROM agg CROSS JOIN tot ORDER BY channel""".stripMargin,

    "q317_assortativity" -> q317Sql,

    // RAKE: stopword-free runs, deg/freq word scores (one floor),
    // phrase = sum of member scores; stopword list generated from
    // TextOps.stopwords so the engines cannot disagree
    "q309_rake_keyphrases" -> {
      val stops = graft.ext.TextOps.stopwords.flatMap(_._2).distinct
        .map(w => s"'${w.replace("'", "''")}'").mkString(", ")
      s"""WITH tk AS (SELECT d.doc_id AS id, CAST(t.i AS BIGINT) AS pos,
         |   d.l[t.i] AS w
         |  FROM (SELECT doc_id,
         |     list_filter(string_split(text, ' '), x -> length(x) > 0) AS l
         |    FROM documents WHERE text IS NOT NULL) d,
         |  unnest(generate_series(1, len(d.l))) AS t(i)),
         | st AS (SELECT id, pos, w, w IN ($stops) AS stop FROM tk),
         | seg AS (SELECT id, pos, w, stop,
         |   sum(CASE WHEN stop THEN 1 ELSE 0 END)
         |     OVER (PARTITION BY id ORDER BY pos) AS pid FROM st),
         | ns AS (SELECT id, pid, pos, w FROM seg WHERE NOT stop),
         | wl AS (SELECT id, pid, pos, w,
         |   count(*) OVER (PARTITION BY id, pid) AS plen FROM ns),
         | ws AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
         |   CAST(sum(plen) AS BIGINT) AS deg FROM wl GROUP BY 1),
         | wsc AS (SELECT w, (deg * 1000) // freq AS wscore FROM ws),
         | ph AS (SELECT wl.id, wl.pid,
         |    string_agg(wl.w, ' ' ORDER BY wl.pos) AS phrase,
         |    CAST(count(*) AS BIGINT) AS n_words,
         |    CAST(sum(wsc.wscore) AS BIGINT) AS score_milli
         |   FROM wl JOIN wsc ON wsc.w = wl.w GROUP BY 1, 2)
         |SELECT phrase, max(n_words) AS n_words,
         | CAST(count(*) AS BIGINT) AS n_occurrences,
         | max(score_milli) AS score_milli
         |FROM ph GROUP BY 1
         |ORDER BY score_milli DESC, phrase LIMIT 50""".stripMargin
    },

    // Nelson-Aalen: KM's risk sets verbatim, one floor per hazard step,
    // plain window cumsum (no recursion - addition is order-free)
    "q311_nelson_aalen" ->
      """WITH b AS (SELECT event_type AS key,
        |   CAST(user_id AS VARCHAR) AS unit,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |    AND ts IS NOT NULL),
        | sp AS (SELECT key, unit, min(day) AS d0, max(day) AS d1
        |  FROM b GROUP BY 1, 2),
        | mx AS (SELECT max(day) AS max_day FROM b),
        | cl AS (SELECT key, d1 - d0 AS dur,
        |   CASE WHEN d1 + 7 <= max_day THEN 1 ELSE 0 END AS death
        |  FROM sp CROSS JOIN mx),
        | ce AS (SELECT key, dur, CAST(count(*) AS BIGINT) AS n_all,
        |   CAST(sum(death) AS BIGINT) AS n_death
        |  FROM cl GROUP BY 1, 2),
        | st AS (SELECT key, dur, n_death,
        |   CAST(sum(n_all) OVER (PARTITION BY key ORDER BY dur DESC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |     AS nr
        |  FROM ce),
        | h AS (SELECT key, dur, nr, n_death,
        |   (n_death * 1000000) // nr AS hz FROM st WHERE n_death > 0)
        |SELECT key AS event_type, dur AS t_day, nr AS n_risk,
        | n_death AS n_deaths, CAST(hz AS BIGINT) AS hazard_step_ppm,
        | CAST(sum(hz) OVER (PARTITION BY key ORDER BY dur
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cum_hazard_ppm
        |FROM h ORDER BY event_type, t_day""".stripMargin,

    // decayed popularity: bit-shift halvings off the corpus max day
    "q310_decayed_popularity" ->
      """WITH d AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        | a AS (SELECT max(day) AS maxd FROM d)
        |SELECT key AS event_type, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(min(a.maxd - d.day) AS BIGINT) AS last_day_age,
        | CAST(sum(1000000 // (CAST(1 AS BIGINT)
        |   << CAST(least((a.maxd - d.day) // 7, 19) AS INT))) AS BIGINT)
        |   AS decayed_ppm
        |FROM d, a GROUP BY 1 ORDER BY event_type""".stripMargin,

    // classical additive decomposition: centered 7-day MA trend (full
    // windows only), slot means of the detrended series, residual
    "q306_seasonal_decomp" ->
      """WITH daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | sp AS (SELECT key, min(day) AS d0, max(day) AS d1 FROM daily
        |  GROUP BY 1 HAVING max(day) - min(day) < 100000),
        | g AS (SELECT sp.key, gs.day, CAST(gs.day - sp.d0 + 1 AS BIGINT) AS i
        |  FROM sp, unnest(generate_series(sp.d0, sp.d1)) AS gs(day)),
        | se AS (SELECT g.key, g.i, coalesce(d.y, 0) AS y
        |  FROM g LEFT JOIN daily d ON d.key = g.key AND d.day = g.day),
        | t AS (SELECT key, i, y,
        |   CASE WHEN count(*) OVER w = 7
        |     THEN CAST(sum(y * 1000) OVER w // 7 AS BIGINT) END AS trend
        |  FROM se WINDOW w AS (PARTITION BY key ORDER BY i
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        | dtr AS (SELECT key, (i - 1) % 7 AS slot, y * 1000 - trend AS det
        |  FROM t WHERE trend IS NOT NULL),
        | seas AS (SELECT key, slot,
        |   CAST(sum(det) // count(*) AS BIGINT) AS seasonal
        |  FROM dtr GROUP BY 1, 2)
        |SELECT t.key AS event_type, t.i, CAST((t.i - 1) % 7 AS BIGINT) AS slot,
        | t.y, t.trend AS trend_milli, seas.seasonal AS seasonal_milli,
        | t.y * 1000 - t.trend - seas.seasonal AS residual_milli
        |FROM t LEFT JOIN seas ON seas.key = t.key AND seas.slot = (t.i - 1) % 7
        |ORDER BY event_type, i""".stripMargin,

    // cross-correlation: day-aligned pair overlap, spearman-style signed
    // r-squared decomposition with the explicit magnitude guard
    "q307_cross_corr" ->
      """WITH daily AS (SELECT event_type AS key,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |   CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        | sp AS (SELECT key, min(day) AS d0, max(day) AS d1 FROM daily
        |  GROUP BY 1 HAVING max(day) - min(day) < 100000),
        | g AS (SELECT sp.key, gs.day FROM sp,
        |   unnest(generate_series(sp.d0, sp.d1)) AS gs(day)),
        | se AS (SELECT g.key, g.day, coalesce(d.y, 0) AS y
        |  FROM g LEFT JOIN daily d ON d.key = g.key AND d.day = g.day),
        | lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
        | agg AS (SELECT a.key AS key_a, b.key AS key_b, l.lag,
        |   CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(a.y) AS HUGEINT) AS sa, CAST(sum(b.y) AS HUGEINT) AS sb,
        |   sum(CAST(a.y AS HUGEINT) * a.y) AS saa,
        |   sum(CAST(b.y AS HUGEINT) * b.y) AS sbb,
        |   sum(CAST(a.y AS HUGEINT) * b.y) AS sab,
        |   CAST(max(a.y) AS HUGEINT) AS ma, CAST(max(b.y) AS HUGEINT) AS mb
        |  FROM se a CROSS JOIN lags l
        |  JOIN se b ON b.key > a.key AND b.day = a.day + l.lag
        |  GROUP BY 1, 2, 3),
        | v AS (SELECT key_a, key_b, lag, n, ma, mb,
        |   n * sab - sa * sb AS cov, n * saa - sa * sa AS vx,
        |   n * sbb - sb * sb AS vy FROM agg)
        |SELECT key_a, key_b, CAST(lag AS BIGINT) AS lag, n AS n_overlap,
        | CAST(CASE WHEN CAST(n AS HUGEINT) * n * ma * mb
        |     <= CAST(300000000000000000 AS HUGEINT)
        |   AND vx > 0 AND vy > 0 THEN
        |   (CASE WHEN cov < 0 THEN -1 ELSE 1 END)
        |   * (((cov * cov * 1000) // (vx * vy)) * 1000
        |      + (((cov * cov * 1000) % (vx * vy)) * 1000) // (vx * vy))
        |   END AS BIGINT) AS r2_signed_ppm
        |FROM v ORDER BY key_a, key_b, lag""".stripMargin,

    // tokenizer fertility: the q142 BPE merge replay aggregated per
    // language — tokens/word and chars/token in truncating milli
    "q303_tokenizer_fertility" ->
      s"""WITH RECURSIVE
         | dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         | w AS (SELECT DISTINCT word FROM dw WHERE length(word) > 0),
         | seg(word, parts) AS (
         |   SELECT word, list_transform(generate_series(1, length(word)), i -> word[i:i]) FROM w
         |   UNION ALL
         |   SELECT word, parts[1:pos-1] || [parts[pos] || parts[pos+1]] || parts[pos+2:len(parts)]
         |   FROM (SELECT word, parts, list_min(rk) AS mr, list_position(rk, list_min(rk)) AS pos
         |         FROM (SELECT word, parts,
         |                list_transform(generate_series(1, len(parts)-1),
         |                  i -> ${bpeRankCase("parts[i]", "parts[i+1]")}) AS rk
         |               FROM seg))
         |   WHERE mr < 999999),
         | fin AS (SELECT word, CAST(min(len(parts)) AS BIGINT) AS n_sub FROM seg GROUP BY 1),
         | perdoc AS (SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS nw,
         |   CAST(sum(fin.n_sub) AS BIGINT) AS nt
         |   FROM dw JOIN fin ON dw.word = fin.word GROUP BY 1),
         | agg AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |   CAST(sum(COALESCE(p.nw, 0)) AS BIGINT) AS n_words,
         |   CAST(sum(COALESCE(p.nt, 0)) AS BIGINT) AS n_bpe_tokens,
         |   CAST(sum(COALESCE(d.n_chars, 0)) AS BIGINT) AS n_chars
         |   FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
         |   WHERE d.lang IS NOT NULL GROUP BY 1)
         |SELECT lang, n_docs, n_words, n_bpe_tokens, n_chars,
         | CAST(CASE WHEN n_words > 0 THEN (n_bpe_tokens * 1000) // n_words END
         |   AS BIGINT) AS fertility_milli,
         | CAST(CASE WHEN n_bpe_tokens > 0 THEN (n_chars * 1000) // n_bpe_tokens END
         |   AS BIGINT) AS chars_per_token_milli
         |FROM agg ORDER BY lang""".stripMargin,

    // JL projection recall: signed-sum 16-d projection replayed with the
    // identical md5-parity signs and left-to-right double folds, recall
    // vs the exact 64-d top-10 (the q167 harness)
    "q304_jl_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         | c AS (SELECT vec_id AS vid, v AS cv FROM e),
         | xs AS (SELECT qid, vid, $cosExpr AS cos FROM q, c WHERE qid <> vid),
         | xr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk FROM xs),
         | ex AS (SELECT qid, vid FROM xr WHERE rk <= 10),
         | pj AS (SELECT vec_id, list_transform(generate_series(0, 15), j ->
         |     list_sum(list_transform(generate_series(1, len(v)), i ->
         |       ((('0x'||substr(md5('7:'||j::VARCHAR||'_'||i::VARCHAR),1,8))::BIGINT
         |         % 2) * 2 - 1)::DOUBLE * v[i]))) AS p
         |   FROM e),
         | pq AS (SELECT vec_id AS qid, p AS qv FROM pj WHERE vec_id < 5),
         | pc AS (SELECT vec_id AS vid, p AS cv FROM pj),
         | ps AS (SELECT qid, vid, $cosExpr AS cos FROM pq, pc WHERE qid <> vid),
         | pr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk FROM ps),
         | pp AS (SELECT qid, vid FROM pr WHERE rk <= 10),
         | j AS (SELECT ex.qid, CASE WHEN pp.vid IS NULL THEN 0 ELSE 1 END AS hit
         |       FROM ex LEFT JOIN pp ON ex.qid = pp.qid AND ex.vid = pp.vid)
         |SELECT qid, CAST(count(*) AS BIGINT) AS n_exact,
         | CAST(sum(hit) AS BIGINT) AS n_hit,
         | CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS recall_ppm
         |FROM j GROUP BY qid ORDER BY qid""".stripMargin,

    // ordered LISTAGG: top-5 suppliers by balance per nation, rank order,
    // ties broken on name (the operator's struct-sort key, verbatim)
    "q301_listagg" ->
      """WITH s AS (SELECT n.n_name AS nation, s.s_name AS name,
        |   -CAST(floor(s.s_acctbal * 100) AS BIGINT) AS negbal
        |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey),
        | r AS (SELECT nation, name,
        |   row_number() OVER (PARTITION BY nation ORDER BY negbal, name) AS rk,
        |   CAST(count(*) OVER (PARTITION BY nation) AS BIGINT) AS ns FROM s)
        |SELECT nation, max(ns) AS n_suppliers,
        | string_agg(name, '|' ORDER BY rk) FILTER (WHERE rk <= 5)
        |   AS top_suppliers
        |FROM r GROUP BY nation ORDER BY nation""".stripMargin
  )
}
