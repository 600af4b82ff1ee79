package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators — the steps between "cleaned
  * corpus" (operators.Dedup / TextAnalysis) and "batches on the trainer":
  * benchmark decontamination, deterministic stratified splits, sequence
  * packing, per-class embedding centroids, pattern redaction, and
  * repetition scoring (Gopher-style quality signal).
  *
  * Scale design (100 TB):
  *  - Decontamination broadcasts the benchmark n-gram set (benchmarks are
  *    MBs, corpora are TBs) and streams the corpus through one explode +
  *    broadcast-semi-join + partial count — no corpus shuffle at all.
  *  - The split is a pure per-row hash — embarrassingly parallel, stable
  *    under reshuffles/reruns, and strata arrive balanced without any
  *    sampling pass. (Here a multiplicative Knuth hash both engines
  *    compute identically in BIGINT; at the lake, xxhash64.)
  *  - Packing assigns each document to the fixed-capacity token block
  *    where its running offset starts: one window cumsum per shard key —
  *    at scale, partition by (shard = hash(doc) % k) and pack per shard
  *    so the window never sees a global sort.
  *  - Centroids are sum/count per (label, dimension) after a posexplode —
  *    a partial-aggregating shuffle of (label, pos) pairs, never vectors.
  *    Per-value floor-to-1e6 BEFORE the sum keeps the aggregation
  *    integer-exact and order-independent (the float-determinism policy
  *    of Relational, applied to vectors).
  */
object TrainPrep {

  /** Word k-gram shingles of `tk` (token array column), distinct. */
  private def kgrams(tk: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), size(tk) - (k - 1)),
      i => concat_ws(" ", (0 until k).map(o => element_at(tk, i + o)): _*)))

  /** DuckDB equivalent of [[kgrams]] over token-list SQL `t`. */
  private def sqlKgrams(t: String, k: Int): String = {
    val parts = (0 until k).map(o => s"($t)[i + $o]").mkString(", ")
    s"list_distinct([ concat_ws(' ', $parts) for i in range(1, len($t) - ${k - 2}) ])"
  }

  val all: Seq[Q] = Seq(

    // Benchmark decontamination: flag corpus documents sharing any 5-gram
    // with the held-out benchmark set (here: every 97th document). The
    // benchmark's distinct 5-grams broadcast; hits counted per document.
    Q("qn11_contamination_check", {
      val toks = sqlTokens("text")
      val sh = sqlKgrams(toks, 5)
      s"""WITH g AS (SELECT doc_id, unnest($sh) AS gram FROM documents WHERE len($toks) >= 5),
         |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
         |corpus AS (SELECT * FROM g WHERE doc_id % 97 <> 0)
         |SELECT corpus.doc_id, COUNT(*) AS n_hits
         |FROM corpus JOIN bench USING (gram)
         |GROUP BY corpus.doc_id
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val g = Tables.documents(s, dir)
        .filter(size(tokens(col("text"))) >= 5)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .select(col("doc_id"), explode(kgrams(col("tk"), 5)).as("gram"))
      val bench = g.filter(col("doc_id") % 97 === 0).select("gram").distinct()
      g.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "gram")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id")
    },

    // Deterministic stratified train/val/test split: bucket = Knuth
    // multiplicative hash of doc_id mod 100; 80/10/10. Identical BIGINT
    // arithmetic in both engines — no RNG, stable under re-runs.
    Q("qn12_stratified_split",
      """WITH s AS (SELECT lang, n_chars,
        |                  (doc_id * 2654435761) % 100 AS bucket
        |           FROM documents)
        |SELECT lang,
        |       CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM s GROUP BY 1, 2 ORDER BY lang, split""".stripMargin) { (s, dir) =>
      val bucket = (col("doc_id") * lit(2654435761L)) % 100
      Tables.documents(s, dir)
        .select(col("lang"), col("n_chars"), bucket.as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang", "split")
    },

    // Per-label embedding centroids, dimension-wise. Values floored to
    // 1e-6 integers BEFORE summing so the aggregate is order-exact.
    Q("qn13_label_centroids",
      """WITH x AS (SELECT label, i AS pos,
        |                  CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS v_e6
        |           FROM embeddings, (SELECT unnest(range(0, 64)) AS i))
        |SELECT label, pos,
        |       COUNT(*) AS n,
        |       CAST(floor(CAST(SUM(v_e6) AS DOUBLE) / COUNT(*)) AS BIGINT) AS centroid_e6
        |FROM x GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin) { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("label"), col("pos"),
          floor(col("v").cast("double") * 1000000).cast("long").as("v_e6"))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n"),
          floor(sum(col("v_e6")).cast("double") / count(lit(1))).cast("long").as("centroid_e6"))
        .orderBy("label", "pos")
    },

    // Sequence packing: documents (in doc_id order) laid end-to-end in
    // token space; each document belongs to the 2048-token block where it
    // starts. GLOBAL-order form with a MEASURED dispatch: one-window
    // cumsum under a row cap, distributed cumsum (range partition +
    // per-partition window + offsets) past it; qn14b below is the
    // shard-keyed form whose packing itself is embarrassingly parallel.
    Q("qn14_sequence_packing", {
      val toks = sqlTokens("text")
      s"""WITH t AS (SELECT doc_id, len($toks) AS n_tok FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |             SUM(n_tok) OVER (ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS start_off
         |      FROM t)
         |SELECT CAST(floor(start_off / 2048.0) AS BIGINT) AS bin,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |       MIN(doc_id) AS first_doc
         |FROM c GROUP BY 1 ORDER BY bin""".stripMargin
    }) { (s, dir) =>
      // Measured dispatch (optimization round 17): two shapes for the
      // global running sum. UNDER the row cap, one unpartitioned window
      // — a single task, but over a corpus measured (metadata-cheap
      // parquet count) to fit one task, and ZERO extra jobs: the first
      // distributed-only cut cost 0.37 s -> 4.97 s at sf0.1, six added
      // jobs dwarfing 5,000 rows. PAST the cap, the
      // [[Dedup.globalRanks]] footprint: range-partition on the order
      // key, per-partition cumsum, per-partition offsets from one
      // O(#partitions) driver pass — the single-task WindowExec wall is
      // gone exactly where it would matter. Result-identical either way
      // (range partitioning preserves the doc_id total order).
      val docs = Tables.documents(s, dir)
      val cap = s.conf.getOption("spark.graft.pack.globalWindowMaxRows")
        .map(_.toLong).getOrElse(10000000L)
      val toked = docs
        .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      val packed =
        if (docs.count() <= cap) {
          val w = Window.orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          toked.withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
        } else {
          val base = toked
            .repartitionByRange(col("doc_id"))
            .withColumn("pid", spark_partition_id())
            .withColumn("lsum", sum(col("n_tok")).over(
              Window.partitionBy("pid").orderBy("doc_id")))
            .localCheckpoint(true) // read twice: offset probe + the groupBy
          val pidTotals = base.groupBy("pid")
            .agg(coalesce(sum(col("n_tok")), lit(0L)).as("t")).collect()
            .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
          val offsets = pidTotals.map(_._1)
            .zip(pidTotals.map(_._2).scanLeft(0L)(_ + _).init)
          val offCol =
            if (offsets.isEmpty) lit(0L)
            else element_at(
              map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*), col("pid"))
          base.withColumn("start_off", offCol + col("lsum") - col("n_tok"))
        }
      packed
        .groupBy(floor(col("start_off") / 2048.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("bin")
    },

    // Shard-keyed sequence packing — the form that survives 100 TB.
    // Documents hash into 8 shards (Knuth multiplicative, same BIGINT
    // arithmetic in both engines); each shard packs independently with a
    // PARTITIONED window cumsum, so the plan is one shuffle on shard and
    // no global sort anywhere. Trainers consume (shard, bin) blocks; at
    // the lake, shards = O(cluster parallelism) and each holds a window
    // small enough to sort in memory.
    Q("qn14b_sharded_packing", {
      val toks = sqlTokens("text")
      s"""WITH t AS (SELECT doc_id, (doc_id * 2654435761) % 8 AS shard,
         |                  len($toks) AS n_tok FROM documents),
         |c AS (SELECT shard, doc_id, n_tok,
         |             SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS start_off
         |      FROM t)
         |SELECT shard, CAST(floor(start_off / 2048.0) AS BIGINT) AS bin,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |       MIN(doc_id) AS first_doc
         |FROM c GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin
    }) { (s, dir) =>
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          ((col("doc_id") * lit(2654435761L)) % 8).as("shard"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
        .groupBy(col("shard"), floor(col("start_off") / 2048.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("shard", "bin")
    },

    // Deterministic balanced subsample: at most 20 vectors per label,
    // chosen by multiplicative hash order (no RNG, stable under re-runs).
    // The row_number-over-window form is written declaratively and the
    // TopKRewriteRule plans it as the TopKPerGroup operator — no
    // per-label sort, k rows per label per partition shuffled.
    Q("qn15_balanced_sample",
      """WITH h AS (SELECT label, vec_id,
        |                  (vec_id * 2654435761) % 1000003 AS hsh
        |           FROM embeddings),
        |r AS (SELECT label, vec_id, hsh,
        |             ROW_NUMBER() OVER (PARTITION BY label
        |               ORDER BY hsh, vec_id) AS rnk FROM h)
        |SELECT label, rnk, vec_id FROM r WHERE rnk <= 20
        |ORDER BY label, rnk""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("label"))
        .orderBy(col("hsh").asc, col("vec_id").asc)
      Tables.embeddings(s, dir)
        .select(col("label"), col("vec_id"),
          ((col("vec_id") * lit(2654435761L)) % 1000003).as("hsh"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 20)
        .select(col("label"), col("rnk").cast("long").as("rnk"), col("vec_id"))
        .orderBy("label", "rnk")
    },

    // Int8 quantization of embeddings: per-vector absmax scaling,
    // floor-quantized (floor, not round — both engines floor doubles
    // identically; round half-up vs half-even could differ). Emits the
    // quantization summary a trainer shards on.
    Q("qn16_quantize_embeddings",
      """WITH m AS (SELECT vec_id, label, embedding,
        |                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |           FROM embeddings),
        |q AS (SELECT vec_id, label, mx,
        |             CASE WHEN mx = 0 THEN [CAST(0 AS BIGINT) for x in embedding]
        |                  ELSE [CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT) for x in embedding]
        |             END AS qv
        |      FROM m)
        |SELECT vec_id, label,
        |       CAST(floor(mx * 1000000) AS BIGINT) AS absmax_e6,
        |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), qv), (a, x) -> a + x) AS BIGINT) AS q_sum,
        |       CAST(list_min(qv) AS BIGINT) AS q_min,
        |       CAST(list_max(qv) AS BIGINT) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val mx = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
      val qv = when(col("mx") === 0,
          transform(col("embedding"), _ => lit(0L)))
        .otherwise(transform(col("embedding"),
          x => floor(x.cast("double") * 127.0 / col("mx")).cast("long")))
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"), mx.as("mx"))
        .select(col("vec_id"), col("label"), col("mx"), qv.as("qv"))
        .select(col("vec_id"), col("label"),
          floor(col("mx") * 1000000).cast("long").as("absmax_e6"),
          aggregate(col("qv"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_min(col("qv")).as("q_min"),
          array_max(col("qv")).as("q_max"))
        .orderBy("vec_id")
    },

    // One deterministic k-means (Lloyd) step over the embeddings — the
    // clustering primitive data-curation pipelines run for cluster-
    // balanced sampling and semantic dedup. Seeds are the same stride
    // rule as IVF (no RNG); assignment is argmin squared-euclidean
    // computed as dot(v,v) - 2 dot(v,c) + dot(c,c) with every dot a
    // sequential double fold, floored to an e6 integer before the argmin
    // so both engines rank identically; new centroids are the qn13-style
    // integer-exact dimension means. Scale shape: centroids broadcast
    // (k rows), assignment is map-side + one row_number window (plans
    // through TopKPerGroup), then one (cluster, pos) partial-agg shuffle
    // — vectors never shuffle whole.
    Q("qn19_kmeans_step", {
      val distE6 = sqlE6(s"${sqlDot("v.embedding", "v.embedding")}" +
        s" - 2 * ${sqlDot("v.embedding", "c.ce")} + ${sqlDot("c.ce", "c.ce")}")
      s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
         |st AS (SELECT GREATEST(1, COUNT(*) // 8) AS stride FROM v),
         |cents AS (SELECT vec_id AS cent_id, embedding AS ce FROM v, st
         |          WHERE vec_id % stride = 0 AND vec_id < stride * 8),
         |asg AS (SELECT vec_id, embedding, cent_id FROM (
         |          SELECT v.vec_id, v.embedding, c.cent_id,
         |                 ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |                   ORDER BY $distE6, c.cent_id) AS rn
         |          FROM v, cents c) WHERE rn = 1),
         |x AS (SELECT cent_id, i AS pos,
         |             CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT) AS v_e6
         |      FROM asg, (SELECT unnest(range(0, 64)) AS i))
         |SELECT cent_id, pos, COUNT(*) AS n,
         |       CAST(floor(CAST(SUM(v_e6) AS DOUBLE) / COUNT(*)) AS BIGINT) AS centroid_e6
         |FROM x GROUP BY 1, 2 ORDER BY cent_id, pos""".stripMargin
    }) { (s, dir) =>
      import graft.functions.VectorExprs.dotNative
      val v = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val st = v.agg(count(lit(1)).as("n_vec"))
        .select(greatest(lit(1L), expr("n_vec div 8")).as("stride"))
      val cents = v.crossJoin(st)
        .filter(col("vec_id") % col("stride") === 0 && col("vec_id") < col("stride") * 8)
        .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
      val distE6 = e6(dotNative(col("embedding"), col("embedding"))
        - lit(2) * dotNative(col("embedding"), col("ce"))
        + dotNative(col("ce"), col("ce")))
      val wA = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist_e6").asc, col("cent_id").asc)
      val asg = v.join(broadcast(cents), expr("true"))
        .select(col("vec_id"), col("embedding"), col("cent_id"), distE6.as("dist_e6"))
        .withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
      asg.select(col("cent_id"), posexplode(col("embedding")).as(Seq("pos", "vv")))
        .select(col("cent_id"), col("pos"),
          floor(col("vv").cast("double") * 1000000).cast("long").as("v_e6"))
        .groupBy("cent_id", "pos")
        .agg(count(lit(1)).as("n"),
          floor(sum(col("v_e6")).cast("double") / count(lit(1))).cast("long").as("centroid_e6"))
        .orderBy("cent_id", "pos")
    },

    // TF-IDF top terms per document in pure integer arithmetic:
    // score_e6 = (tf * N * 1e6) div (df * n_tok) — no log, no float, so
    // both engines rank identically with no epsilon anywhere. Top-3 per
    // doc through the declarative window form -> TopKPerGroup operator.
    Q("qt08_tfidf_top_terms", {
      val toks = sqlTokens("text")
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS term FROM documents),
         |n_tok AS (SELECT doc_id, COUNT(*) AS n_tok FROM tk GROUP BY 1),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tk GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |s AS (SELECT tf.doc_id, tf.term,
         |             (tf.tf * n.n * 1000000) // (df.df * n_tok.n_tok) AS score_e6
         |      FROM tf JOIN df USING (term) JOIN n_tok USING (doc_id) CROSS JOIN n),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |               ORDER BY score_e6 DESC, term) AS rnk FROM s)
         |SELECT doc_id, rnk, term, score_e6 FROM r WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin
    }) { (s, dir) =>
      // Scale shape: every side here is corpus-derived (tf is per
      // (doc, term), df per term, n_tok per doc), so NOTHING broadcasts —
      // df joins shuffled-hash on term, n_tok comes out of the tf frame
      // itself as a window sum (the join the old plan broadcast a
      // per-document table for is gone entirely), and the corpus size N
      // folds in as a single-row crossJoin instead of a driver count()
      // job. The n_tok window and the rank window share one exchange on
      // doc_id (same partitioning, consecutive Window ops).
      val docs = Tables.documents(s, dir)
      val tk = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .localCheckpoint(true) // barrier: feeds tf and df subtrees
      val tf = tk.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tk.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val wDoc = Window.partitionBy(col("doc_id"))
      val w = wDoc.orderBy(col("score_e6").desc, col("term").asc)
      tf.join(df.hint("SHUFFLE_HASH"), "term")
        .crossJoin(docs.agg(count(lit(1)).as("n_total")))
        .withColumn("n_tok", sum(col("tf")).over(wDoc))
        .withColumn("score_e6", expr("(tf * n_total * 1000000) div (df * n_tok)"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk").cast("long").as("rnk"), col("term"), col("score_e6"))
        .orderBy("doc_id", "rnk")
    },

    // Data-mixture weighting (DoReMi/temperature-sampling shape): per
    // language, the corpus's natural token share p is flattened to
    // p^0.5 and renormalized, then a 100M-token epoch budget is
    // apportioned. Float discipline: sqrt and the p division are both
    // IEEE-correctly-rounded in either engine, and each sqrt is floored
    // to an e6 integer BEFORE the normalizing sum — so the sum is exact
    // integer arithmetic and the final weights are bit-identical no
    // matter what order groups aggregate in. Scale shape: one corpus
    // aggregation, then two single-row crossJoins over the (tiny,
    // checkpointed) group frame — the corpus is scanned exactly once.
    Q("qn25_mixture_weights", {
      val toks = sqlTokens("text")
      s"""WITH g AS (SELECT lang, COUNT(*) AS n_docs,
         |                  CAST(SUM(len($toks)) AS BIGINT) AS n_tokens
         |           FROM documents GROUP BY lang),
         |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM g),
         |s AS (SELECT lang, n_docs, n_tokens,
         |             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / tot) * 1000000) AS BIGINT) AS w_sqrt_e6
         |      FROM g, t),
         |w AS (SELECT CAST(SUM(w_sqrt_e6) AS BIGINT) AS wtot FROM s)
         |SELECT lang, n_docs, n_tokens, w_sqrt_e6,
         |       (w_sqrt_e6 * 1000000) // wtot AS w_norm_e6,
         |       (w_sqrt_e6 * 100000000) // wtot AS budget_tokens
         |FROM s, w ORDER BY lang""".stripMargin
    }) { (s, dir) =>
      val g = Tables.documents(s, dir)
        .select(col("lang"), size(tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .localCheckpoint(true) // one corpus scan: g feeds both scalar sums below
      val sq = g.crossJoin(g.agg(sum(col("n_tokens")).as("tot")))
        .withColumn("w_sqrt_e6",
          floor(sqrt(col("n_tokens").cast("double") / col("tot")) * 1000000).cast("long"))
      sq.crossJoin(sq.agg(sum(col("w_sqrt_e6")).as("wtot")))
        .select(col("lang"), col("n_docs"), col("n_tokens"), col("w_sqrt_e6"),
          expr("(w_sqrt_e6 * 1000000) div wtot").as("w_norm_e6"),
          expr("(w_sqrt_e6 * 100000000) div wtot").as("budget_tokens"))
        .orderBy("lang")
    },

    // One BPE merge-selection step — the inner loop of tokenizer vocab
    // induction: count adjacent character pairs corpus-wide, take the
    // top candidates. The classic scale move is applied: occurrences
    // collapse to the DISTINCT-word frequency table first, so the
    // per-character explode runs over |vocab| words (thousands), not
    // corpus tokens (trillions); pair counts then weight by word
    // frequency. Pair keys are a tiny space, the final top-10 is a
    // TakeOrderedAndProject (k-row merge, no global sort).
    Q("qn26_bpe_merge", {
      val toks = sqlTokens("text")
      s"""WITH w AS (SELECT word, COUNT(*) AS wc
         |           FROM (SELECT unnest($toks) AS word FROM documents)
         |           GROUP BY word),
         |c AS (SELECT split(word, '') AS cs, wc FROM w WHERE length(word) >= 2),
         |p AS (SELECT unnest([cs[i] || cs[i + 1] for i in range(1, len(cs))]) AS pair, wc
         |      FROM c)
         |SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt
         |FROM p GROUP BY pair ORDER BY cnt DESC, pair LIMIT 10""".stripMargin
    }) { (s, dir) =>
      val wfreq = Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("wc"))
        .filter(length(col("word")) >= 2)
      val cs = split(col("word"), "")
      wfreq
        .select(col("wc"), cs.as("cs"))
        .select(col("wc"), explode(transform(sequence(lit(1), size(col("cs")) - 1),
          i => concat(element_at(col("cs"), i), element_at(col("cs"), i + 1)))).as("pair"))
        .groupBy("pair").agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(10)
    },

    // Mixture-apply: the resampling step that turns qn25's weights into
    // an actual training subset. Each language's token budget (here a
    // 10k-token epoch) becomes a per-document Bernoulli rate
    // (budget/n_tokens, capped at 1), applied as the same deterministic
    // Knuth-hash coin as qn12 — so the "random" subset is a pure
    // function of doc_id, stable under re-runs and reshuffles, and the
    // realized token counts land within one document of the budget in
    // expectation. Scale shape: one corpus aggregation for the rates
    // (tiny, broadcast back), then a map-side filter — the selection
    // itself never shuffles.
    Q("qn29_mixture_apply", {
      val toks = sqlTokens("text")
      s"""WITH g AS (SELECT lang, CAST(SUM(len($toks)) AS BIGINT) AS n_tokens
         |           FROM documents GROUP BY lang),
         |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM g),
         |s AS (SELECT lang, n_tokens,
         |             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / tot) * 1000000) AS BIGINT) AS w_sqrt_e6
         |      FROM g, t),
         |w AS (SELECT CAST(SUM(w_sqrt_e6) AS BIGINT) AS wtot FROM s),
         |r AS (SELECT lang, n_tokens,
         |             LEAST(1000000, (((w_sqrt_e6 * 10000) // wtot) * 1000000) // n_tokens) AS rate_e6
         |      FROM s, w),
         |d AS (SELECT doc.lang, doc.doc_id, len($toks) AS n_tok, r.rate_e6
         |      FROM documents doc JOIN r USING (lang))
         |SELECT lang, rate_e6, COUNT(*) AS n_docs,
         |       CAST(SUM(CASE WHEN (doc_id * 2654435761) % 1000000 < rate_e6
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
         |       CAST(SUM(CASE WHEN (doc_id * 2654435761) % 1000000 < rate_e6
         |                     THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens_selected
         |FROM d GROUP BY lang, rate_e6 ORDER BY lang""".stripMargin
    }) { (s, dir) =>
      val perDoc = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      val g = perDoc.groupBy("lang").agg(sum(col("n_tok")).as("n_tokens"))
        .localCheckpoint(true) // one corpus scan feeds both scalar sums
      val sq = g.crossJoin(g.agg(sum(col("n_tokens")).as("tot")))
        .withColumn("w_sqrt_e6",
          floor(sqrt(col("n_tokens").cast("double") / col("tot")) * 1000000).cast("long"))
      val rates = sq.crossJoin(sq.agg(sum(col("w_sqrt_e6")).as("wtot")))
        .select(col("lang"),
          least(lit(1000000L),
            expr("((w_sqrt_e6 * 10000) div wtot) * 1000000 div n_tokens")).as("rate_e6"))
      val coin = (col("doc_id") * lit(2654435761L)) % 1000000
      perDoc.join(broadcast(rates), "lang")
        .groupBy("lang", "rate_e6")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(coin < col("rate_e6"), 1L).otherwise(0L)).as("n_selected"),
          sum(when(coin < col("rate_e6"), col("n_tok")).otherwise(0L)).as("n_tokens_selected"))
        .orderBy("lang")
    },

    // Count-min sketch heavy hitters: build a 2x64 CMS over corpus term
    // counts with deterministic polynomial hashes, then read back the
    // top-20 exact terms' estimates. The sketch rows are built from the
    // exact term-count frame (one explode + one groupBy feeds both), so
    // the whole thing — including every collision-inflated estimate — is
    // a pure function of the corpus and replays in the oracle. At scale
    // the sketch is what travels: 2x64 cells regardless of vocabulary,
    // so profiling a 100 TB corpus ships KBs; width is the
    // accuracy knob (est - exact <= N/w in expectation). The candidate
    // top-20 is TakeOrdered (k rows to one partition, never the vocab);
    // the cell joins broadcast genuinely bounded 64-row sides.
    Q("qn28_countmin_hitters", {
      val h0 = s"(${sqlPolyHash("term", 37L, P1)}) % 64"
      val h1 = s"(${sqlPolyHash("term", 131L, P2)}) % 64"
      val toks = sqlTokens("text")
      s"""WITH tk AS (SELECT unnest($toks) AS term FROM documents),
         |e AS (SELECT term, COUNT(*) AS cnt FROM tk GROUP BY term),
         |c0 AS (SELECT $h0 AS b0, CAST(SUM(cnt) AS BIGINT) AS cell0 FROM e GROUP BY 1),
         |c1 AS (SELECT $h1 AS b1, CAST(SUM(cnt) AS BIGINT) AS cell1 FROM e GROUP BY 1),
         |cand AS (SELECT term, cnt,
         |                ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rnk FROM e)
         |SELECT rnk, term, cnt AS exact_cnt,
         |       LEAST(c0.cell0, c1.cell1) AS est_cnt
         |FROM cand
         |JOIN c0 ON ($h0) = c0.b0
         |JOIN c1 ON ($h1) = c1.b1
         |WHERE rnk <= 20 ORDER BY rnk""".stripMargin
    }) { (s, dir) =>
      val exact = Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // feeds both sketch rows + the candidates
      def bucket(mult: Long, prime: Long) = polyHash(col("term"), mult, prime) % 64
      val c0 = exact.groupBy(bucket(37L, P1).as("b0"))
        .agg(sum(col("cnt")).as("cell0"))
      val c1 = exact.groupBy(bucket(131L, P2).as("b1"))
        .agg(sum(col("cnt")).as("cell1"))
      // Top-20 candidates via TakeOrdered; the rank window then runs
      // over exactly k rows (bounded by k, not by the vocabulary).
      val cand = exact.orderBy(col("cnt").desc, col("term").asc).limit(20)
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("cnt").desc, col("term").asc)))
      cand
        .withColumn("b0", bucket(37L, P1)).join(broadcast(c0), "b0")
        .withColumn("b1", bucket(131L, P2)).join(broadcast(c1), "b1")
        .select(col("rnk").cast("long").as("rnk"), col("term"),
          col("cnt").as("exact_cnt"), least(col("cell0"), col("cell1")).as("est_cnt"))
        .orderBy("rnk")
    },

    // Pattern redaction (PII-shaped plumbing) over the events JSON props:
    // digit runs masked, redaction volume accounted per event type.
    Q("qt06_redact_props",
      """SELECT event_type,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(length(props) - length(regexp_replace(props, '[0-9]', '', 'g'))) AS BIGINT)
        |         AS n_digits,
        |       COUNT(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g')) AS n_distinct_redacted
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(length(col("props")) - length(regexp_replace(col("props"), "[0-9]", "")))
            .as("n_digits"),
          countDistinct(regexp_replace(col("props"), "[0-9]+", "#"))
            .as("n_distinct_redacted"))
        .orderBy("event_type")
    },

    // Repetition scoring (Gopher-style quality signals): duplicate-token
    // fraction and top-bigram fraction per document, as 1e-6 integers.
    Q("qt07_repetition_scores", {
      val toks = sqlTokens("text")
      val big = s"[ concat_ws(' ', ($toks)[i], ($toks)[i + 1]) for i in range(1, len($toks)) ]"
      s"""WITH t AS (SELECT doc_id, len($toks) AS n_tok,
         |                  len(list_distinct($toks)) AS n_uniq, $big AS bigrams
         |           FROM documents WHERE len($toks) >= 2),
         |b AS (SELECT doc_id, unnest(bigrams) AS bg FROM t),
         |c AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
         |m AS (SELECT doc_id, MAX(cnt) AS max_bg FROM c GROUP BY 1)
         |SELECT t.doc_id, t.n_tok,
         |       ${sqlE6("CAST(t.n_tok - t.n_uniq AS DOUBLE) / t.n_tok")} AS dup_frac_e6,
         |       ${sqlE6("CAST(m.max_bg AS DOUBLE) / len(t.bigrams)")} AS top_bigram_frac_e6
         |FROM t JOIN m USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val tk = tokens(col("text"))
      val bigrams = transform(sequence(lit(1), size(col("tk")) - 1),
        i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1)))
      val t = Tables.documents(s, dir)
        .filter(size(tk) >= 2)
        .select(col("doc_id"), tk.as("tk"))
        .select(col("doc_id"), size(col("tk")).as("n_tok"),
          size(array_distinct(col("tk"))).as("n_uniq"), bigrams.as("bigrams"))
        .localCheckpoint(true) // barrier: bigrams feed explode + stats (see Dedup)
      val maxBg = t.select(col("doc_id"), explode(col("bigrams")).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg(max(col("cnt")).as("max_bg"))
      t.join(maxBg, "doc_id")
        .select(col("doc_id"), col("n_tok"),
          e6(col("n_tok").minus(col("n_uniq")).cast("double") / col("n_tok")).as("dup_frac_e6"),
          e6(col("max_bg").cast("double") / size(col("bigrams"))).as("top_bigram_frac_e6"))
        .orderBy("doc_id")
    }
  )
}
