package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the LLM-training-
  * data half of the engine (SURVEY.md §2 north-star; QN1/QN2 expanded).
  *
  * Scale design (100 TB): every variant is a pure shuffle-on-key plan.
  * - Exact dedup groups on the normalized text itself at test SF; at lake
  *   scale substitute `sha2(norm, 256)` as the grouping key so the shuffle
  *   moves 32-byte keys instead of document bodies (same result, modulo
  *   2^-128 collisions).
  * - The Jaccard join uses *prefix filtering*: a pair with J >= 0.6 must
  *   share a token among the first `|A| - ceil(0.6|A|) + 1` of the sorted
  *   token set, so candidate generation is an equi-join on (prefix token),
  *   never a cross join. Token-frequency skew is the known hazard: at
  *   scale, order token sets by ascending global document frequency
  *   (two-pass) instead of lexicographically so prefixes hold the rarest
  *   tokens; the filter stays lossless under any consistent total order.
  * - MinHash/LSH and SimHash banding are the sub-linear candidate paths:
  *   equi-joins on band keys / 15-bit chunks, both AQE-skew-splittable.
  *
  * All thresholds are evaluated in integer arithmetic (`5|∩| >= 3|∪|`
  * instead of `|∩|/|∪| >= 0.6`) so Spark and the DuckDB oracle cannot
  * diverge on float rounding; reported scores are floor-scaled to 1e-6
  * integers ([[graft.functions.TextFns.e6]]).
  */
object Dedup {

  /** Whitespace-collapsed, trimmed, lowercased text — the exact-dup key. */
  private def norm(c: org.apache.spark.sql.Column) =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  private val sqlNorm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** Token sets + size, shared head of the near-dup plans. */
  private def tokenized(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokenSet(col("text")).as("toks"))
      .withColumn("sz", size(col("toks")))

  private val sqlTokenized =
    s"SELECT doc_id, ${sqlTokenSet("text")} AS toks, len(${sqlTokenSet("text")}) AS sz FROM documents"

  val all: Seq[Q] = Seq(

    Q("qn01_exact_dedup_stats",
      s"""SELECT COUNT(*) AS n_docs,
         |       COUNT(DISTINCT $sqlNorm) AS n_unique,
         |       COUNT(*) - COUNT(DISTINCT $sqlNorm) AS n_dup_docs
         |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(norm(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(norm(col("text")))).as("n_dup_docs"))
    },

    Q("qn02_dedup_representatives",
      s"""SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY $sqlNorm
         |HAVING COUNT(*) > 1 ORDER BY keeper_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(norm(col("text")).as("k"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .select("keeper_id", "n_copies")
        .orderBy("keeper_id")
    },

    // Exact token-set Jaccard >= 0.6 pairs via lossless prefix filtering.
    // Integer prefix length: ceil(3*sz/5) computed as (3*sz + 4) div 5 —
    // no float ceil, so the prefix can never round short and drop a pair.
    Q("qn03_jaccard_pairs",
      s"""WITH t AS ($sqlTokenized)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       len(list_intersect(a.toks, b.toks)) AS n_inter,
         |       a.sz + b.sz - len(list_intersect(a.toks, b.toks)) AS n_union,
         |       ${sqlE6("CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / (a.sz + b.sz - len(list_intersect(a.toks, b.toks)))")} AS j_e6
         |FROM t a, t b
         |WHERE a.doc_id < b.doc_id
         |  AND 5 * len(list_intersect(a.toks, b.toks))
         |      >= 3 * (a.sz + b.sz - len(list_intersect(a.toks, b.toks)))
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val t = tokenized(s, dir)
      // (3*sz+4)/5 is exact in double for any plausible sz, so the cast
      // truncation is a true integer ceil(3*sz/5).
      val prefixLen = col("sz") - ((lit(3) * col("sz") + lit(4)) / lit(5)).cast("int") + lit(1)
      val pre = t.select(col("doc_id"), explode(slice(col("toks"), lit(1), prefixLen)).as("tok"))
      val cands = pre.as("x").join(pre.as("y"), col("x.tok") === col("y.tok"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // Merge-walk intersection count (custom codegen expression): the
      // token sets are array_sort'ed, so |A∩B| needs no hash set.
      val inter = graft.functions.SortedIntersectCount(col("ta"), col("tb"))
      val uni = col("sza") + col("szb") - inter
      cands
        .join(broadcast(t.select(col("doc_id").as("doc_a"), col("toks").as("ta"), col("sz").as("sza"))), "doc_a")
        .join(broadcast(t.select(col("doc_id").as("doc_b"), col("toks").as("tb"), col("sz").as("szb"))), "doc_b")
        .filter(lit(5) * inter >= lit(3) * uni)
        .select(col("doc_a"), col("doc_b"), inter.as("n_inter"), uni.as("n_union"),
          e6(inter.cast("double") / uni).as("j_e6"))
        .orderBy("doc_a", "doc_b")
    },

    // N-gram (3-shingle) Jaccard: word ORDER matters here, unlike the
    // token-set variant above — shingle sets are far more discriminative,
    // which is why production near-dup pipelines shingle first. Same
    // lossless prefix filter at J >= 0.5 (prefix = sz - ceil(sz/2) + 1).
    Q("qn03b_shingle_jaccard_pairs", {
      val toks = sqlTokens("text")
      val sh = s"list_sort(list_distinct([ concat_ws(' ', ($toks)[i], ($toks)[i+1], ($toks)[i+2]) " +
        s"for i in range(1, len($toks) - 1) ]))"
      s"""WITH t AS (SELECT doc_id, $sh AS toks, len($sh) AS sz FROM documents
         |           WHERE len($toks) >= 3)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       len(list_intersect(a.toks, b.toks)) AS n_inter,
         |       a.sz + b.sz - len(list_intersect(a.toks, b.toks)) AS n_union
         |FROM t a, t b
         |WHERE a.doc_id < b.doc_id
         |  AND 2 * len(list_intersect(a.toks, b.toks))
         |      >= a.sz + b.sz - len(list_intersect(a.toks, b.toks))
         |ORDER BY doc_a, doc_b""".stripMargin
    }) { (s, dir) =>
      val toksRaw = tokens(col("text"))
      val shingles = array_sort(array_distinct(transform(
        sequence(lit(1), size(col("tk")) - 2),
        i => concat_ws(" ", element_at(col("tk"), i),
          element_at(col("tk"), i + 1), element_at(col("tk"), i + 2)))))
      val t = Tables.documents(s, dir)
        .filter(size(toksRaw) >= 3)
        .select(col("doc_id"), toksRaw.as("tk"))
        .select(col("doc_id"), shingles.as("toks"))
        .withColumn("sz", size(col("toks")))
      // ceil(sz/2) = (sz+1) div 2, exact in double for any plausible sz.
      val prefixLen = col("sz") - ((col("sz") + lit(1)) / lit(2)).cast("int") + lit(1)
      val pre = t.select(col("doc_id"), explode(slice(col("toks"), lit(1), prefixLen)).as("tok"))
      val cands = pre.as("x").join(pre.as("y"), col("x.tok") === col("y.tok"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val inter = graft.functions.SortedIntersectCount(col("ta"), col("tb"))
      val uni = col("sza") + col("szb") - inter
      cands
        .join(broadcast(t.select(col("doc_id").as("doc_a"), col("toks").as("ta"), col("sz").as("sza"))), "doc_a")
        .join(broadcast(t.select(col("doc_id").as("doc_b"), col("toks").as("tb"), col("sz").as("szb"))), "doc_b")
        .filter(lit(2) * inter >= uni)
        .select(col("doc_a"), col("doc_b"), inter.as("n_inter"), uni.as("n_union"))
        .orderBy("doc_a", "doc_b")
    },

    // MinHash(64) + LSH(16 bands x 4 rows) candidate pairs with the
    // signature-agreement count. The oracle brute-forces the identical
    // banding over all pairs; the Spark plan only ever equi-joins on band
    // keys — the sub-linear path that survives 100 TB.
    Q("qn04_minhash_lsh_pairs", {
      val hs = s"[ ${sqlTokenHash("t")} for t in toks ]"
      s"""WITH t AS ($sqlTokenized),
         |sig AS (SELECT doc_id, ${sqlMinhashSig(hs, 64)} AS sig FROM t),
         |band AS (SELECT doc_id,
         |                [ concat_ws('-', b, sig[4*b+1], sig[4*b+2], sig[4*b+3], sig[4*b+4])
         |                  for b in range(0, 16) ] AS bands, sig FROM sig)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       len(list_filter(list_zip(a.sig, b.sig), p -> p[1] = p[2])) AS n_agree
         |FROM band a, band b
         |WHERE a.doc_id < b.doc_id AND len(list_intersect(a.bands, b.bands)) > 0
         |ORDER BY doc_a, doc_b""".stripMargin
    }) { (s, dir) =>
      // Token-hash array materialized in its own projection: minhashSig
      // references it 64 times, and an inlined expression would be
      // re-evaluated (full re-hash of every token) per permutation.
      val sig = tokenized(s, dir)
        .select(col("doc_id"), transform(col("toks"), tokenHash(_)).as("hs"))
        .select(col("doc_id"), minhashSig(col("hs"), 64).as("sig"))
      // Narrow-first: the band self-join and the pair-dedup shuffle move
      // only (doc_a, doc_b) ints; the 64-long signatures rejoin AFTER the
      // distinct (sig is per-doc, i.e. broadcast-sized relative to the
      // pair set), so n_agree is computed once per unique pair. Carrying
      // the signatures through the join made the distinct shuffle ~60x
      // wider and dominated the whole query at sf0.1.
      val banded = sig.select(col("doc_id"),
        explode(lshBands(col("sig"), 16, 4)).as("band"))
      val cands = banded.as("x").join(banded.as("y"), col("x.band") === col("y.band"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // Codegen'd positional-agreement count (vs the interpreted
      // zip_with/filter/size chain) — runs once per candidate pair.
      val nAgree = graft.functions.PairwiseEqCount(col("sa"), col("sb"))
      cands
        .join(broadcast(sig.select(col("doc_id").as("doc_a"), col("sig").as("sa"))), "doc_a")
        .join(broadcast(sig.select(col("doc_id").as("doc_b"), col("sig").as("sb"))), "doc_b")
        .select(col("doc_a"), col("doc_b"), nAgree.as("n_agree"))
        .orderBy("doc_a", "doc_b")
    },

    Q("qn05_simhash_values", {
      val hs = s"[ ${sqlTokenHash60("t")} for t in toks ]"
      s"""WITH t AS ($sqlTokenized)
         |SELECT doc_id, ${sqlSimhash(hs)} AS simhash
         |FROM t ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      tokenized(s, dir)
        .select(col("doc_id"), transform(col("toks"), tokenHash60(_)).as("hs"))
        .select(col("doc_id"), simhash(col("hs")).as("simhash"))
        .orderBy("doc_id")
    },

    // The composed training-data pipeline — quality gate -> exact dedup
    // -> near-dup removal (greedy keep-lowest-id at jaccard >= 0.8) ->
    // corpus stats. This is the operators above chained the way a real
    // cleaning job runs them; each stage reuses the scale-shaped plan it
    // was verified with.
    Q("qp01_clean_corpus", {
      val toks = sqlTokens("text")
      val stops = TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString("[", ", ", "]")
      val nStop = s"len(list_filter($toks, t -> list_contains($stops, t)))"
      s"""WITH q AS (SELECT * FROM documents
         |           WHERE len($toks) >= 10 AND 10 * $nStop >= len($toks)),
         |d AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY $sqlNorm),
         |t AS (SELECT doc_id, ${sqlTokenSet("text")} AS toks, len(${sqlTokenSet("text")}) AS sz
         |      FROM documents WHERE doc_id IN (SELECT doc_id FROM d)),
         |dup AS (SELECT DISTINCT b.doc_id FROM t a JOIN t b
         |        ON a.doc_id < b.doc_id
         |          AND 5 * len(list_intersect(a.toks, b.toks))
         |              >= 4 * (a.sz + b.sz - len(list_intersect(a.toks, b.toks)))),
         |survivors AS (SELECT doc_id FROM t
         |              WHERE doc_id NOT IN (SELECT doc_id FROM dup))
         |SELECT COUNT(*) AS n_clean,
         |       (SELECT COUNT(*) FROM documents) AS n_raw,
         |       (SELECT COUNT(*) FROM q) AS n_quality,
         |       (SELECT COUNT(*) FROM d) AS n_exact_unique,
         |       CAST(SUM(sz) AS BIGINT) AS sum_vocab
         |FROM survivors JOIN t USING (doc_id)""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val nTok = size(tokens(col("text")))
      val nStop = size(filter(tokens(col("text")), t =>
        array_contains(array(TextAnalysis.stopwordsEn.map(lit): _*), t)))
      val quality = docs.filter(nTok >= 10 && nStop * 10 >= nTok)
      val exact = quality.groupBy(norm(col("text")).as("k"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val t = docs.join(exact, "doc_id")
        .select(col("doc_id"), tokenSet(col("text")).as("toks"))
        .withColumn("sz", size(col("toks")))
      // Near-dup pairs at jaccard >= 0.8 via the same lossless prefix
      // filter (prefix length = sz - ceil(4*sz/5) + 1).
      val prefixLen = col("sz") - ((lit(4) * col("sz") + lit(4)) / lit(5)).cast("int") + lit(1)
      val pre = t.select(col("doc_id"), explode(slice(col("toks"), lit(1), prefixLen)).as("tok"))
      val cands = pre.as("x").join(pre.as("y"), col("x.tok") === col("y.tok"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val inter = graft.functions.SortedIntersectCount(col("ta"), col("tb"))
      val uni = col("sza") + col("szb") - inter
      val dupB = cands
        .join(broadcast(t.select(col("doc_id").as("doc_a"), col("toks").as("ta"), col("sz").as("sza"))), "doc_a")
        .join(broadcast(t.select(col("doc_id").as("doc_b"), col("toks").as("tb"), col("sz").as("szb"))), "doc_b")
        .filter(lit(5) * inter >= lit(4) * uni)
        .select(col("doc_b").as("doc_id")).distinct()
      val clean = t.join(dupB, Seq("doc_id"), "left_anti")
      clean.agg(
        count(lit(1)).as("n_clean"),
        lit(docs.count()).as("n_raw"),
        lit(quality.count()).as("n_quality"),
        lit(exact.count()).as("n_exact_unique"),
        sum(col("sz")).as("sum_vocab"))
    },

    // SimHash near-dup pairs: Hamming distance <= 3 over the 60-bit
    // signature. Spark generates candidates by the pigeonhole principle —
    // split 60 bits into 4 chunks of 15; distance <= 3 forces at least one
    // identical chunk — so candidates come from 4 equi-joins, not O(n^2).
    Q("qn06_simhash_near_pairs", {
      val hs = s"[ ${sqlTokenHash60("t")} for t in toks ]"
      s"""WITH t AS ($sqlTokenized),
         |sh AS (SELECT doc_id, ${sqlSimhash(hs)} AS simhash FROM t)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM sh a, sh b
         |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    }) { (s, dir) =>
      val sh = tokenized(s, dir)
        .select(col("doc_id"), transform(col("toks"), tokenHash60(_)).as("hs"))
        .select(col("doc_id"), simhash(col("hs")).as("simhash"))
      val chunked = sh.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(c => concat_ws(":", lit(c),
          shiftright(col("simhash"), c * 15).bitwiseAND(lit((1L << 15) - 1)))): _*))
          .as("chunk"))
      val ham = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
      // Hamming filter BEFORE the pair-dedup: bit_count on the join row is
      // a few cycles, and survivors (<= 3 of 60 bits) are rare, so the
      // distinct shuffles a tiny fraction of the candidate stream.
      chunked.as("x").join(chunked.as("y"), col("x.chunk") === col("y.chunk"))
        .filter(col("x.doc_id") < col("y.doc_id") && ham <= 3)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          ham.cast("long").as("hamming"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    }
  )
}
