package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Canon, TextFns}
import Registry.{tbl, duckMd5Long}

/** Training-data text pipeline: token stats, quality scoring, language-ID,
  * fingerprints, and the dedup family (exact, MinHash+LSH, SimHash, word-set
  * Jaccard). All hash arithmetic uses the portable md5-prefix hash so the
  * DuckDB oracle reproduces every value bit-for-bit (see Canon.md5Long).
  */
object QueriesText {

  import TextFns.P

  /** tokens as DuckDB expr (order-preserving, empty tokens dropped). */
  private def duckTokens(x: String): String =
    s"list_filter(string_split_regex($x, '\\s+'), t -> t != '')"

  private val q18 = Q("q18_txt_token_stats",
    (s, dir) => tbl(s, dir, "documents")
      .select(col("doc_id"),
        TextFns.tokenCount(col("text")).as("n_tok"),
        TextFns.bpeishCount(col("text")).as("n_bpeish"),
        TextFns.punctCount(col("text")).as("n_punct"),
        length(col("text")).as("len_chars"),
        col("n_chars"))
      .orderBy("doc_id"),
    Some(
      s"""SELECT doc_id,
         |  len(${duckTokens("text")}) AS n_tok,
         |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS n_bpeish,
         |  length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]-]', '', 'g')) AS n_punct,
         |  length(text) AS len_chars, n_chars
         |FROM documents ORDER BY doc_id""".stripMargin))

  private val q19 = Q("q19_txt_quality_score",
    (s, dir) => tbl(s, dir, "documents")
      .select(col("doc_id"),
        TextFns.stopwordCount(col("text")).as("n_stop"),
        TextFns.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id"),
    Some {
      val sw = TextFns.stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text,
         |  len(${duckTokens("text")}) AS n_tok, length(text) AS n_chr,
         |  len(list_filter(${duckTokens("lower(text)")}, t -> t IN ($sw))) AS n_stop
         |  FROM documents)
         |SELECT doc_id, n_stop,
         |  round(least(n_tok/100.0::DOUBLE, 1.0::DOUBLE) * 0.4
         |    + least((CASE WHEN n_tok > 0 THEN n_stop::DOUBLE/n_tok::DOUBLE ELSE 0.0::DOUBLE END) * 5.0, 1.0::DOUBLE) * 0.3
         |    + (CASE WHEN (CASE WHEN n_tok > 0 THEN n_chr::DOUBLE/n_tok::DOUBLE ELSE 0.0::DOUBLE END) BETWEEN 3.0 AND 10.0 THEN 1.0::DOUBLE ELSE 0.5::DOUBLE END) * 0.3, 6)
         |  AS quality
         |FROM t ORDER BY doc_id""".stripMargin
    })

  private val q20 = Q("q20_txt_lang_id",
    (s, dir) => tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextFns.langId(col("text")).as("pred"),
        (TextFns.langId(col("text")) === col("lang")).cast("int").as("agree"))
      .orderBy("doc_id"),
    Some {
      val codes = TextFns.langMarkers.keys.toSeq.sorted
      val scoreExprs = codes.map { c =>
        val ms = TextFns.langMarkers(c).map(w => s"'$w'").mkString(", ")
        s"len(list_filter(${duckTokens("lower(text)")}, t -> t IN ($ms))) AS s_$c"
      }.mkString(",\n  ")
      val m = s"greatest(${codes.map("s_" + _).mkString(", ")})"
      val pick = codes.map(c => s"WHEN s_$c = _m THEN '$c'").mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang, $scoreExprs FROM documents),
         |s AS (SELECT *, $m AS _m FROM t),
         |p AS (SELECT doc_id, lang,
         |  CASE WHEN _m = 0 THEN 'und' $pick END AS pred FROM s)
         |SELECT doc_id, lang, pred,
         |  CASE WHEN pred = lang THEN 1 ELSE 0 END AS agree
         |FROM p ORDER BY doc_id""".stripMargin
    })

  private val q21 = Q("q21_txt_fingerprint",
    (s, dir) => tbl(s, dir, "documents")
      .select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id"),
    Some(
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_concat([0::BIGINT], list_transform(${duckTokens("text")},
         |      t -> ${duckMd5Long("t")} % ${P})),
         |    (a, h) -> (a * 31 + h) % ${P}) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin))

  /** Exact dedup: hash-groupBy on content (the canonical first stage of any
    * corpus dedup; map-side partial agg, one shuffle on the hash key).
    */
  private val q22 = Q("q22_dedup_exact",
    (s, dir) => tbl(s, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keeper"))
      .orderBy("content_hash"),
    Some(
      """SELECT md5(text) AS content_hash, count(*) AS n_dups,
        |  min(doc_id) AS keeper
        |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin))

  // ------------------------------------------------------- MinHash + LSH

  val SHINGLE_K = 3
  val SIG_K = 32
  val BANDS = 8
  val ROWS_PER_BAND = 4
  private val coeffs = TextFns.minhashCoeffs(SIG_K)

  /** doc_id + hs (distinct 3-shingle hashes, mod P). Shingle hashes are
    * composed arithmetically from per-TOKEN hashes — one md5 per token
    * instead of one per (longer) shingle string, ~5x less hashing with
    * identical LSH behavior; the composition (h1*8191 + h2*127 + h3) mod P
    * is order-sensitive like a real shingle.
    */
  private def shingleHashes(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        transform(TextFns.tokens(col("text")),
          t => pmod(Canon.md5Long(t), lit(P))).as("hw"))
      .withColumn("hs",
        when(size(col("hw")) >= SHINGLE_K,
          array_distinct(transform(
            sequence(lit(1), size(col("hw")) - lit(SHINGLE_K - 1)),
            i => pmod(element_at(col("hw"), i) * lit(8191L)
              + element_at(col("hw"), i + 1) * lit(127L)
              + element_at(col("hw"), i + 2), lit(P)))))
          .otherwise(array().cast("array<bigint>")))
      .drop("hw")

  /** DuckDB CTE `shd`: doc_id, lang, hs (distinct shingle hashes). */
  private val duckShingles: String =
    s"""_w AS (SELECT doc_id, lang,
       |  list_transform(${duckTokens("text")}, t -> ${duckMd5Long("t")} % ${P}) AS hw
       |  FROM documents),
       |shd AS (SELECT doc_id, lang,
       |  CASE WHEN len(hw) >= $SHINGLE_K
       |    THEN list_distinct(list_transform(range(1, len(hw) - ${SHINGLE_K - 2}),
       |         i -> (hw[i]*8191 + hw[i+1]*127 + hw[i+2]) % ${P}))
       |    ELSE [] END AS hs FROM _w)""".stripMargin

  private def sigExpr(i: Int): Column = {
    val (a, b) = coeffs(i)
    array_min(transform(col("hs"), h => pmod(lit(a) * h + lit(b), lit(P))))
  }

  private def duckSigExpr(i: Int): String = {
    val (a, b) = coeffs(i)
    s"list_min(list_transform(hs, h -> ($a * h + $b) % ${P}))"
  }

  private def bandKey(b: Int): Column =
    // concat (not concat_ws): null sigs — docs with < SHINGLE_K tokens —
    // must propagate to a null band key exactly like the oracle's ||
    concat((0 until ROWS_PER_BAND).flatMap(r =>
      Seq(sigExpr(b * ROWS_PER_BAND + r).cast("string"), lit("-")))
      .dropRight(1): _*)

  private def duckBandKey(b: Int): String =
    (0 until ROWS_PER_BAND)
      .map(r => s"${duckSigExpr(b * ROWS_PER_BAND + r)}::VARCHAR")
      .mkString("||'-'||")

  private def bands(s: SparkSession, dir: String): DataFrame =
    shingleHashes(s, dir)
      .select(col("doc_id"),
        posexplode(array((0 until BANDS).map(bandKey): _*))
          .as(Seq("band_id", "band_key")))

  private val duckBands: String =
    s"""$duckShingles,
       |_sig AS (SELECT doc_id, [${(0 until BANDS).map(duckBandKey).mkString(", ")}] AS bks FROM shd),
       |bands AS (SELECT doc_id, i AS band_id, bks[i+1] AS band_key
       |  FROM _sig, (SELECT unnest(range(0, $BANDS)) AS i) _idx)""".stripMargin

  /** MinHash signatures in banded form: (doc_id, band_id, band_key). */
  private val q23 = Q("q23_dedup_minhash_sig",
    (s, dir) => bands(s, dir).orderBy("doc_id", "band_id"),
    Some(
      s"""WITH $duckBands
         |SELECT doc_id, band_id, band_key FROM bands
         |ORDER BY doc_id, band_id""".stripMargin))

  /** LSH candidate pairs verified by true shingle Jaccard ≥ 0.5 — the
    * scale path: no all-pairs comparison, only bucket collisions are
    * verified. Hash note: md5-prefix hashing is kept so the DuckDB oracle
    * reproduces every signature bit-for-bit; a production deployment would
    * swap Canon.md5Long for xxhash64 (same structure, ~10x faster) once an
    * external oracle is no longer needed.
    */
  private val q24 = Q("q24_dedup_minhash_pairs",
    (s, dir) => {
      // bucket-collect pair generation: one pass computes the signatures,
      // buckets gather their members, and candidate pairs are the in-bucket
      // combinations — no self-join, so the (expensive) MinHash columns are
      // evaluated once instead of twice
      val buckets = bands(s, dir)
        .groupBy("band_id", "band_key")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
      val cand = buckets
        .select(explode(flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))),
            y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct()
      val sets = shingleHashes(s, dir).select(col("doc_id"), col("hs"))
      cand
        .join(broadcast(sets.as("sa")), col("doc_a") === col("sa.doc_id"))
        .join(broadcast(sets.as("sb")), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("sa.hs"), col("sb.hs"))).cast("double") /
            size(array_union(col("sa.hs"), col("sb.hs")))).as("jacc"))
        .filter(col("jacc") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jacc"), 6).as("jacc"))
        .orderBy("doc_a", "doc_b")
    },
    Some(
      s"""WITH $duckBands,
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |  ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |j AS (SELECT doc_a, doc_b,
         |  len(list_distinct(list_intersect(sa.hs, sb.hs)))::DOUBLE /
         |  len(list_distinct(sa.hs || sb.hs)) AS jacc
         |  FROM cand JOIN shd sa ON doc_a = sa.doc_id JOIN shd sb ON doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, round(jacc, 6) AS jacc FROM j
         |WHERE jacc >= 0.5 ORDER BY doc_a, doc_b""".stripMargin))

  val SIMHASH_BITS = 48

  /** SimHash-48 per doc (packed long), computed by the explode/groupBy
    * formulation (scales linearly; no 48-way expression blowup).
    */
  private val q25 = Q("q25_dedup_simhash",
    (s, dir) => {
      val toks = tbl(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(TextFns.tokens(col("text")))).as("tok"))
        .withColumn("h", Canon.md5Long(col("tok")))
      val votes = (0 until SIMHASH_BITS).map { b =>
        sum(when(pmod(shiftright(col("h"), b), lit(2L)) === 1L, 1L)
          .otherwise(-1L)).as(s"v$b")
      }
      toks.groupBy("doc_id")
        .agg(votes.head, votes.tail: _*)
        .select(col("doc_id"),
          (0 until SIMHASH_BITS)
            .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
            .reduce(_ + _).as("simhash"))
        .orderBy("doc_id")
    },
    Some {
      val votes = (0 until SIMHASH_BITS).map(b =>
        s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(",\n  ")
      val pack = (0 until SIMHASH_BITS)
        .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      s"""WITH t AS (SELECT doc_id,
         |  unnest(list_distinct(${duckTokens("text")})) AS tok FROM documents),
         |h AS (SELECT doc_id, ${duckMd5Long("tok")} AS h FROM t),
         |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
         |SELECT doc_id, $pack AS simhash FROM v ORDER BY doc_id""".stripMargin
    })

  /** Word-set Jaccard near-dup pairs, blocked by language (blocking keeps
    * the pair space linear-ish instead of all-pairs at scale).
    */
  private val q26 = Q("q26_dedup_ngram_jaccard",
    (s, dir) => {
      // word sets as distinct token HASHES (portable md5-prefix): integer
      // set intersection is ~5x cheaper than string sets at identical
      // Jaccard semantics (collisions ~2^-31, and mirrored in the oracle)
      val w = tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          array_distinct(transform(TextFns.tokens(col("text")),
            t => pmod(Canon.md5Long(t), lit(P)))).as("ws"))
      // lang has ~5 values and the scan is a single file split: a shuffle
      // join would put each language block on ONE core. Broadcast the build
      // side and spread the probe side over all cores explicitly.
      w.repartition(s.sparkContext.defaultParallelism, col("doc_id")).as("a")
        .join(broadcast(w).as("b"),
          col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          (size(array_intersect(col("a.ws"), col("b.ws"))).cast("double") /
            size(array_union(col("a.ws"), col("b.ws")))).as("jacc"))
        .filter(col("jacc") >= 0.9)
        .select(col("doc_a"), col("doc_b"), round(col("jacc"), 6).as("jacc"))
        .orderBy("doc_a", "doc_b")
    },
    Some(
      s"""WITH w AS (SELECT doc_id, lang,
         |  list_distinct(list_transform(${duckTokens("text")},
         |    t -> ${duckMd5Long("t")} % ${P})) AS ws FROM documents),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  len(list_distinct(list_intersect(a.ws, b.ws)))::DOUBLE /
         |  len(list_distinct(a.ws || b.ws)) AS jacc
         |  FROM w a JOIN w b ON a.lang = b.lang AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, round(jacc, 6) AS jacc FROM p
         |WHERE jacc >= 0.9 ORDER BY doc_a, doc_b""".stripMargin))

  /** Multimodal plumbing (oracle-able half): documents' text treated as an
    * opaque binary payload with deterministic fake decode metadata — the
    * real mapPartitions decode stub lives in graft.operators.Multimodal.
    */
  private val q27 = Q("q27_mm_binary_meta",
    (s, dir) => tbl(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).as("n_bytes"),
        (lit(64L) + pmod(Canon.md5Long(concat(col("doc_id").cast("string"), lit("w"))), lit(960L))).as("width"),
        (lit(64L) + pmod(Canon.md5Long(concat(col("doc_id").cast("string"), lit("h"))), lit(960L))).as("height"),
        (lit(1L) + pmod(Canon.md5Long(concat(col("doc_id").cast("string"), lit("f"))), lit(30L))).as("n_frames"))
      .orderBy("doc_id"),
    Some(
      s"""SELECT doc_id,
         |  octet_length(encode(text)) AS n_bytes,
         |  64 + ${duckMd5Long("doc_id::VARCHAR||'w'")} % 960 AS width,
         |  64 + ${duckMd5Long("doc_id::VARCHAR||'h'")} % 960 AS height,
         |  1 + ${duckMd5Long("doc_id::VARCHAR||'f'")} % 30 AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin))

  val qs: Seq[Q] = Seq(q18, q19, q20, q21, q22, q23, q24, q25, q26, q27)
}
