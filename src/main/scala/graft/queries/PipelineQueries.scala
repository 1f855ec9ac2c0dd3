package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Training-data curation operators beyond dedup: repetition scoring
 * (Gopher-style duplicate-n-gram fractions), deny-list redaction,
 * budget-based sequence packing (concat-and-chunk), and deterministic
 * stratified sampling. All four carry full DuckDB value oracles — every
 * metric is exact integer or integer-ratio arithmetic, so float parity
 * is trivial.
 *
 * Scale shapes:
 *  - repetition: one scan for the n-gram fractions (array-side, codegen)
 *    + an explode/groupBy for the top-token count (partial aggs, uniform
 *    doc_id keys) joined on doc_id — no all-pairs anything.
 *  - redaction: pure per-row transform, zero shuffles.
 *  - packing: running sum windowed per (lang) partition — parallel across
 *    partition keys; a 100 TB run keys by (lang, shard) so no window
 *    partition exceeds one task (the pack ids stay deterministic because
 *    shard boundaries are doc_id ranges).
 *  - sampling: stateless hash filter, zero shuffles, rates broadcast as
 *    a literal CASE.
 */
object PipelineQueries {
  import Tables.t

  private def docs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(col("doc_id"), col("text"), col("lang"))

  private def toks(c: Column): Column = split(c, " ")

  /** Tokens masked when exactly equal to a deny-list term. */
  private val denyList = Seq("customer", "value", "table")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- repetition scoring (Gopher-style): duplicate 2-/3-gram
    //     fractions + most-frequent-token share. Filters like
    //     "drop if dup_3gram_frac > 0.2" are the standard pretraining
    //     quality gate after dedup. ---
    "q_doc_repetition" -> ((s, d) => {
      val tk = toks(col("text"))
      // n-grams once per row, array-side; fractions are exact integer
      // ratios so the oracle compare is bit-stable
      val grams = docs(s, d).select(col("doc_id"), tk.as("tk"))
        .select(col("doc_id"),
          size(col("tk")).cast("long").as("n_tokens"),
          transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat_ws(" ", element_at(col("tk"), i),
              element_at(col("tk"), i + 1))).as("g2"),
          transform(sequence(lit(1), size(col("tk")) - 2),
            i => concat_ws(" ", element_at(col("tk"), i),
              element_at(col("tk"), i + 1),
              element_at(col("tk"), i + 2))).as("g3"))
        .select(col("doc_id"), col("n_tokens"),
          (lit(1.0) - size(array_distinct(col("g2"))).cast("double") /
            size(col("g2")).cast("double")).as("dup_2gram_frac"),
          (lit(1.0) - size(array_distinct(col("g3"))).cast("double") /
            size(col("g3")).cast("double")).as("dup_3gram_frac"))
      val top = docs(s, d)
        .select(col("doc_id"), explode(tk).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("top_cnt"))
      grams.join(top, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          col("dup_2gram_frac"), col("dup_3gram_frac"),
          (col("top_cnt").cast("double") /
            col("n_tokens").cast("double")).as("top_token_frac"))
        .withColumn("repetitive",
          col("dup_3gram_frac") > 0.2 || col("top_token_frac") > 0.2)
        .orderBy(col("doc_id"))
    }),

    // --- deny-list redaction (PII-masking shape): replace exact-match
    //     tokens with [MASK], report the redaction count. Per-row
    //     transform only — the 100 TB plan is a scan. ---
    "q_doc_redact" -> ((s, d) => {
      val tk = toks(col("text"))
      val hit = (t: Column) => denyList.map(w => t === w).reduce(_ || _)
      docs(s, d).select(col("doc_id"),
          size(filter(tk, hit)).cast("long").as("n_redacted"),
          array_join(transform(tk,
            t => when(hit(t), lit("[MASK]")).otherwise(t)), " ").as("redacted"))
        .orderBy(col("doc_id"))
    }),

    // --- deterministic shard shuffle (training reproducibility): every
    //     run must see the SAME pseudo-random permutation regardless of
    //     cluster size or input split order. Key = md5(seed ++ doc_id)
    //     (content-independent, stable across re-ingest); shard = the
    //     key's first hex nibble range-bucketed into 8 (uniform — md5
    //     nibbles are uniform); position = rank within shard. The window
    //     partitions BY SHARD, so the permutation computes distributed —
    //     never one global sort partition. Both engines emit identical
    //     lowercase-hex md5 → full value oracle. ---
    "q_shard_shuffle" -> ((s, d) => {
      docs(s, d)
        .select(col("doc_id"),
          md5(concat(lit("ep1:"), col("doc_id").cast("string"))).as("k"))
        .withColumn("shard", expr(
          "CAST((instr('0123456789abcdef', substring(k, 1, 1)) - 1) div 2 AS BIGINT)"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("k"), col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))
    }),

    // --- sequence packing (concat-and-chunk): docs in doc_id order are
    //     concatenated per language; a doc's pack is its starting token
    //     offset / budget. Exactly the packing step that turns a cleaned
    //     corpus into fixed-budget training sequences. ---
    "q_pack_sequences" -> ((s, d) => {
      val budget = 256
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, d)
        .select(col("lang"), col("doc_id"),
          size(toks(col("text"))).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("pack_id",
          floor((col("cum") - col("n_tok")) / lit(budget)))
        .groupBy(col("lang"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("pack_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("lang"), col("pack_id"))
    }),

    // --- benchmark decontamination: flag training docs sharing any
    //     token 5-gram with the (small) eval set. Eval-side distinct
    //     hashes broadcast to an equality join against the one-pass
    //     codegen shingle kernel — at 100 TB the eval suite is still
    //     KBs, so the scan side never shuffles. Counts are on 64-bit
    //     FNV hash sets (the accepted ~|A||B|/2^64 collision odds of
    //     the dedup family); the oracle intersects string 5-grams. ---
    "q_decontaminate" -> ((s, d) => {
      import graft.operators.Dedup
      val evalHashes = docs(s, d).filter(col("doc_id") < 10)
        .select(explode(Dedup.shingleHashes(col("text"), 5)).as("h"))
        .distinct()
      val train = Tables.spread(docs(s, d).filter(col("doc_id") >= 10))
        .select(col("doc_id"),
          explode(Dedup.shingleHashes(col("text"), 5)).as("h"))
      train.join(broadcast(evalHashes), "h")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"))
    }),

    // --- sequence packing, SHARDED: the 100 TB twin of q_pack_sequences.
    //     Window keys are (lang, doc_id-range shard) so no window
    //     partition exceeds one task regardless of corpus size; pack ids
    //     are deterministic because shard boundaries are fixed doc_id
    //     ranges (a doc's pack never depends on other shards). ---
    "q_pack_sequences_sharded" -> ((s, d) => {
      val budget = 256
      val shard = floor(col("doc_id") / lit(100)).as("shard")
      val w = Window.partitionBy(col("lang"), col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, d)
        .select(col("lang"), shard, col("doc_id"),
          size(toks(col("text"))).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("pack_id",
          floor((col("cum") - col("n_tok")) / lit(budget)))
        .groupBy(col("lang"), col("shard"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("pack_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("lang"), col("shard"), col("pack_id"))
    }),

    // --- unigram log-probability quality scoring (the CCNet-style LM
    //     filter proxy): each doc scored by its average negative log
    //     unigram probability under the corpus's own distribution.
    //     Determinism contract: per-doc sums fold in token-POSITION
    //     order (sort_array over (pos, lp) structs — collect_list order
    //     is not deterministic after a shuffle), mirrored by the
    //     oracle's list(lp ORDER BY pos); ln inputs are exact count
    //     ratios and the result rounds to 6 decimals. Scale: the freq
    //     table is vocab-sized (broadcast here, plain hash join at
    //     web-corpus vocabs); everything else is explode + two
    //     partial-agg groupBys on uniform keys. ---
    "q_doc_logprob" -> ((s, d) => {
      val tok = docs(s, d)
        .select(col("doc_id"), posexplode(toks(col("text"))))
        .withColumnRenamed("col", "token")
      val freq = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      val tot = tok.agg(count(lit(1)).as("tot"))
      val scored = tok.join(broadcast(freq), "token")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("pos"),
          negate(log(col("cnt").cast("double") / col("tot").cast("double")))
            .as("lp"))
      scored.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("lp")))).as("ps"))
        .select(col("doc_id"),
          size(col("ps")).cast("long").as("n_tokens"),
          round(
            aggregate(col("ps"), lit(0.0), (a, x) => a + x.getField("lp")) /
              size(col("ps")), 6).as("avg_nll"))
        .orderBy(col("doc_id"))
    }),

    // --- duplicated-chunk removal (the Lee et al. "Deduplicating
    //     Training Data" substring-dedup analog at chunk granularity):
    //     docs split into non-overlapping 8-token chunks; only the
    //     globally FIRST occurrence of a chunk (by doc_id, then position)
    //     survives, and docs are rebuilt from their kept chunks. Scale:
    //     one shuffle on the chunk key (the dedup-family shape — hot
    //     chunks skew like hot shingles, same accepted profile); rebuild
    //     is a per-doc position-sorted fold. All string-exact. ---
    "q_dedup_chunks" -> ((s, d) => {
      val cs = 8
      val tk = toks(col("text"))
      val occ = docs(s, d).select(col("doc_id"),
          transform(
            sequence(lit(0), ceil(size(tk) / lit(cs.toDouble)).cast("int") - 1),
            i => array_join(slice(tk, i * cs + 1, lit(cs)), " ")).as("chunks"))
        // graft posexplode (round 18): the ExplodeBase form let
        // InferFiltersFromGenerate + pushdown clone the chunk transform
        // 2x into a pre-filter (3 evaluations/row, interpreted HOF)
        .select(col("doc_id"), graft.functions.GraftExplode.posexplodeOnce(col("chunks")))
        .withColumnRenamed("col", "chunk").withColumnRenamed("pos", "idx")
      val w = Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("idx"))
      occ.withColumn("kept", row_number().over(w) === 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          array_join(
            transform(
              sort_array(collect_list(
                when(col("kept"), struct(col("idx"), col("chunk"))))),
              x => x.getField("chunk")), " ").as("cleaned"))
        .orderBy(col("doc_id"))
    }),

    // --- DSIR-style importance weighting (Xie et al., "Data Selection
    //     for Language Models via Importance Resampling"): each doc
    //     scored by the average log-likelihood ratio of its tokens under
    //     a target unigram LM (here: the corpus's en slice) vs the raw
    //     corpus LM, Laplace-smoothed over the observed vocab. Exact
    //     integer count ratios into ln, position-ordered fold (the
    //     q_doc_logprob determinism contract), round 6. Scale: both
    //     models are vocab-sized broadcasts; at web-corpus vocabs swap
    //     tokens for the hashed-bucket kernel (Dedup.tokenBuckets) —
    //     identical plan shape. ---
    "q_dsir_weight" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), posexplode(toks(col("text"))))
        .withColumnRenamed("col", "token")
      val raw = tok.groupBy("token").agg(count(lit(1)).as("c_raw"))
      val tgt = tok.filter(col("lang") === "en")
        .groupBy("token").agg(count(lit(1)).as("c_tgt"))
      val model = raw.join(tgt, Seq("token"), "left").na.fill(0L, Seq("c_tgt"))
      val totals = tok.agg(count(lit(1)).as("n_raw"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_tgt"),
        countDistinct(col("token")).as("v"))
      tok.join(broadcast(model), "token").crossJoin(broadcast(totals))
        .select(col("doc_id"), col("pos"),
          (log((col("c_tgt") + 1).cast("double") /
              (col("n_tgt") + col("v")).cast("double")) -
            log((col("c_raw") + 1).cast("double") /
              (col("n_raw") + col("v")).cast("double"))).as("w"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("ps"))
        .select(col("doc_id"),
          size(col("ps")).cast("long").as("n_tokens"),
          round(
            aggregate(col("ps"), lit(0.0), (a, x) => a + x.getField("w")) /
              size(col("ps")), 6).as("dsir_w"))
        .orderBy(col("doc_id"))
    }),

    // --- stratified sampling: per-language keep rates applied through a
    //     deterministic multiplicative hash of doc_id (Knuth constant),
    //     permille buckets. Stateless filter — reproducible across runs
    //     and replayable in SQL, unlike rand()-based sampling. ---
    "q_sample_stratified" -> ((s, d) => {
      val bucket = (col("doc_id") * lit(2654435761L)) % 1000
      val rate = when(col("lang") === "en", 100)
        .when(col("lang") === "zh", 200)
        .otherwise(500)
      docs(s, d)
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .filter(col("bucket") < rate)
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_doc_repetition" ->
      """WITH tk AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         grams AS (
           SELECT doc_id, len(t) AS n_tokens,
             list_transform(range(1, len(t)),
               i -> t[i] || ' ' || t[i+1]) AS g2,
             list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g3
           FROM tk),
         top AS (
           SELECT doc_id, max(c) AS top_cnt FROM (
             SELECT doc_id, t2, count(*) AS c
             FROM (SELECT doc_id, unnest(t) AS t2 FROM tk)
             GROUP BY doc_id, t2)
           GROUP BY doc_id)
         SELECT g.doc_id, n_tokens,
           1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) AS dup_2gram_frac,
           1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) AS dup_3gram_frac,
           CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_frac,
           (1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)) > 0.2
             OR (CAST(top_cnt AS DOUBLE) / n_tokens) > 0.2 AS repetitive
         FROM grams g JOIN top USING (doc_id)
         ORDER BY doc_id""",

    "q_doc_redact" ->
      """SELECT doc_id,
           len(list_filter(string_split(text, ' '),
             x -> x = 'customer' OR x = 'value' OR x = 'table')) AS n_redacted,
           array_to_string(list_transform(string_split(text, ' '),
             x -> CASE WHEN x = 'customer' OR x = 'value' OR x = 'table'
                  THEN '[MASK]' ELSE x END), ' ') AS redacted
         FROM documents ORDER BY doc_id""",

    "q_shard_shuffle" ->
      """WITH keyed AS (
           SELECT doc_id,
             md5('ep1:' || CAST(doc_id AS VARCHAR)) AS k
           FROM documents)
         SELECT doc_id,
           CAST((strpos('0123456789abcdef', substr(k, 1, 1)) - 1) // 2 AS BIGINT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY (strpos('0123456789abcdef', substr(k, 1, 1)) - 1) // 2
             ORDER BY k, doc_id) AS BIGINT) AS pos
         FROM keyed ORDER BY doc_id""",

    "q_pack_sequences" ->
      """WITH s AS (
           SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok
           FROM documents),
         c AS (
           SELECT *, sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM s)
         SELECT lang, CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM c GROUP BY lang, pack_id ORDER BY lang, pack_id""",

    "q_decontaminate" ->
      """WITH g AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, len(string_split(text, ' ')) - 3),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
               || ' ' || string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3]
               || ' ' || string_split(text, ' ')[i+4])) AS s
           FROM documents),
         ev AS (SELECT DISTINCT unnest(s) AS g5 FROM g WHERE doc_id < 10),
         tr AS (SELECT doc_id, unnest(s) AS g5 FROM g WHERE doc_id >= 10)
         SELECT doc_id, count(*) AS n_shared
         FROM tr JOIN ev USING (g5)
         GROUP BY doc_id ORDER BY doc_id""",

    "q_pack_sequences_sharded" ->
      """WITH s AS (
           SELECT lang, CAST(floor(doc_id / 100.0) AS BIGINT) AS shard,
             doc_id, len(string_split(text, ' ')) AS n_tok
           FROM documents),
         c AS (
           SELECT *, sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM s)
         SELECT lang, shard, CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM c GROUP BY lang, shard, pack_id ORDER BY lang, shard, pack_id""",

    "q_doc_logprob" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         tok AS (
           SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos, t FROM t),
         tok2 AS (SELECT doc_id, pos, t[pos] AS token FROM tok),
         freq AS (SELECT token, count(*) AS c FROM tok2 GROUP BY token),
         tot AS (SELECT count(*) AS tt FROM tok2),
         lp AS (
           SELECT doc_id, pos,
             -ln(CAST(c AS DOUBLE) / (SELECT tt FROM tot)) AS lp
           FROM tok2 JOIN freq USING (token)),
         agg AS (
           SELECT doc_id, list(lp ORDER BY pos) AS lps FROM lp GROUP BY doc_id)
         SELECT doc_id, CAST(len(lps) AS BIGINT) AS n_tokens,
           round(list_aggregate(lps, 'sum') / len(lps), 6) AS avg_nll
         FROM agg ORDER BY doc_id""",

    "q_dedup_chunks" ->
      """WITH tk AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         ch AS (
           SELECT doc_id,
             unnest(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS idx, t
           FROM tk),
         occ AS (
           SELECT doc_id, idx,
             array_to_string(t[(idx*8+1):(idx*8+8)], ' ') AS chunk
           FROM ch),
         mk AS (
           SELECT doc_id, idx, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) = 1
               AS kept
           FROM occ)
         SELECT doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE kept),
             '') AS cleaned
         FROM mk GROUP BY doc_id ORDER BY doc_id""",

    "q_dsir_weight" ->
      """WITH t AS (
           SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
         tok AS (
           SELECT doc_id, lang, unnest(range(1, len(t) + 1)) AS pos, t FROM t),
         tok2 AS (SELECT doc_id, lang, pos, t[pos] AS token FROM tok),
         raw AS (SELECT token, count(*) AS c_raw FROM tok2 GROUP BY token),
         tgt AS (SELECT token, count(*) AS c_tgt FROM tok2
                 WHERE lang = 'en' GROUP BY token),
         tot AS (SELECT count(*) AS n_raw,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt,
                   count(DISTINCT token) AS v
                 FROM tok2),
         w AS (
           SELECT doc_id, pos,
             ln((coalesce(c_tgt, 0) + 1) / CAST(n_tgt + v AS DOUBLE)) -
             ln((c_raw + 1) / CAST(n_raw + v AS DOUBLE)) AS w
           FROM tok2 JOIN raw USING (token) LEFT JOIN tgt USING (token), tot),
         agg AS (
           SELECT doc_id, list(w ORDER BY pos) AS ws FROM w GROUP BY doc_id)
         SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
           round(list_aggregate(ws, 'sum') / len(ws), 6) AS dsir_w
         FROM agg ORDER BY doc_id""",

    "q_sample_stratified" ->
      """SELECT doc_id, lang,
           (doc_id * CAST(2654435761 AS BIGINT)) % 1000 AS bucket
         FROM documents
         WHERE (doc_id * CAST(2654435761 AS BIGINT)) % 1000 <
           CASE WHEN lang = 'en' THEN 100 WHEN lang = 'zh' THEN 200
                ELSE 500 END
         ORDER BY doc_id"""
  )
}
