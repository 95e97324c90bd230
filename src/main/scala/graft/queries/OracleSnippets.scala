package graft.queries

import graft.text.TextOps

/** Shared DuckDB-oracle SQL builders — ONE rendering of each operator's
  * oracle semantics, consumed by TextQueries, DedupQueries and the
  * corpus_curation composite. The Spark side of these semantics lives
  * in TextOps/Dedup; keeping a single SQL mirror per operator means a
  * parameter change (stopword list, band count, bucket cap, threshold)
  * can't silently desynchronize one query's oracle from another's.
  */
private[queries] object OracleSnippets {

  /** DuckDB mirror of TextOps.memberHits. */
  def hitsSql(members: Seq[String]): String =
    s"len(list_filter(str_split(text, ' '), t -> t IN (${members.map("'" + _ + "'").mkString(",")})))"

  /** DuckDB mirror of TextOps.qualityScore. */
  val qualitySql: String =
    s"""0.4 * least(1.0, CAST(length(text) AS DOUBLE) / 500.0)
       |    + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text))
       |    + 0.3 * least(1.0, CAST(${hitsSql(TextOps.Stopwords)} AS DOUBLE)
       |                         / len(str_split(text, ' ')) * 4.0)""".stripMargin

  /** Per-language marker-score select list (s_en, s_es, ...). */
  val langScoresSql: String = TextOps.LangMarkers.map { case (l, m) =>
    s"CAST(${hitsSql(m)} AS DOUBLE) / len(str_split(text, ' ')) AS s_$l"
  }.mkString(", ")

  /** DuckDB mirror of TextOps.langId's argmax CASE chain. */
  val langCaseSql: String = {
    val langs = TextOps.LangMarkers.map(_._1)
    val cases = langs.init.map { l =>
      val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE '${langs.last}' END"
  }

  /** DuckDB mirror of TextOps.duplicateNgramFraction (bigram
    * repetition: 1 − distinct/total occurrences; 0.0 below 2 tokens). */
  val dupFractionSql: String =
    """(CASE WHEN len(str_split(text, ' ')) >= 2 THEN
      |  1.0 - CAST(len(list_distinct(list_transform(
      |          range(1, len(str_split(text, ' '))),
      |          i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1]))) AS DOUBLE)
      |        / (len(str_split(text, ' ')) - 1)
      | ELSE 0.0 END)""".stripMargin

  /** DuckDB mirror of Dedup.connectedComponents over a `good(id_a,
    * id_b)` CTE of verified pairs: recursive reachability, component =
    * min reachable id. Emits edges/reach/nodes/comp; callers SELECT
    * from `comp(id, component)`. Must appear under a WITH RECURSIVE
    * prologue. */
  val componentsCte: String =
    """edges AS (SELECT id_a AS src, id_b AS dst FROM good
      |          UNION SELECT id_b, id_a FROM good),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT reach.src, e.dst FROM reach JOIN edges e ON e.src = reach.dst),
      |nodes AS (SELECT DISTINCT src AS id FROM edges),
      |comp AS (SELECT n.id, least(n.id, min(r.dst)) AS component
      |         FROM nodes n JOIN reach r ON r.src = n.id GROUP BY n.id)""".stripMargin

  /** DuckDB mirror of Dedup.wordShingles(text, n): the distinct word
    * n-grams of a single-space-tokenized `text` column (empty for docs
    * shorter than n tokens — range() is empty when its bound is ≤ 1). */
  def wordShinglesSql(n: Int): String =
    s"list_distinct(list_transform(range(1, len(str_split(text, ' ')) - ${n - 2}), " +
      s"i -> array_to_string(str_split(text, ' ')[i:i+${n - 1}], ' ')))"

  /** The mutant-CHAIN corpus the cluster-family dedup queries share:
    * documents ∪ (+100000, ' xtra') ∪ (+200000, ' xtra ytra') for
    * doc_id<50 — A~B and B~C near-dup chains so components genuinely
    * merge. Spark twin: DedupQueries.chainedMutantCorpus. */
  val chainedMutantCorpusSql: String =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text || ' xtra' AS text
      |  FROM documents WHERE doc_id < 50
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id, text || ' xtra ytra' AS text
      |  FROM documents WHERE doc_id < 50""".stripMargin

  /** Full cluster-query prologue: chained-mutant corpus → LSH pairs →
    * verified pairs → connected components. Callers continue with
    * their own CTEs and SELECT from `corpus`/`comp`. Must follow a
    * `WITH RECURSIVE` keyword. */
  // lazy: minhashLshPairsCte is defined further down the file — a
  // strict val here would capture null at object init
  lazy val mutantClusterPrologue: String =
    s"""corpus AS (
       |  $chainedMutantCorpusSql),
       |$minhashLshPairsCte,
       |good AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= 0.6),
       |$componentsCte""".stripMargin

  /** DuckDB mirror of Hashing.rowDigest: low 60 bits of
    * md5(id|payload) as a BIGINT, for the commutative bit_xor group
    * digest — edit both together. */
  def rowDigestSql(idExpr: String, payloadExpr: String): String =
    s"CAST(('0x' || substring(md5(CAST($idExpr AS VARCHAR) || '|' || $payloadExpr), 1, 15)) AS BIGINT)"

  /** DuckDB mirror of Hashing.md5Bucket: a 0..n-1 bucket from the
    * first 4 hex digits of md5(expr) — the deterministic hash-split
    * primitive (Spark side: conv(substring(md5, 1, 4), 16, 10) % n). */
  def md5BucketSql(expr: String, n: Int = 10): String = {
    def hexDigit(i: Int) =
      s"(instr('0123456789abcdef', substring(md5($expr), $i, 1)) - 1)"
    s"((4096 * ${hexDigit(1)} + 256 * ${hexDigit(2)} + 16 * ${hexDigit(3)} + ${hexDigit(4)}) % $n)"
  }

  /** DuckDB mirror of CorpusOps.dsirWeights: hashed unigram+bigram
    * bucket distributions for the en-language target sample and the
    * whole raw corpus, add-one smoothed log importance ratios, per-doc
    * 6-dp summed weights — the CTE chain through `wts(doc_id,
    * dsir_weight)` that BOTH dsir rows (driver-k and threshold cut)
    * rank, single-sourced so the selection math cannot drift between
    * them. */
  def dsirWeightsCtes(buckets: Int): String =
    s"""rw AS (SELECT doc_id, list_filter(str_split(text, ' '), t -> t <> '') AS w
       |           FROM documents),
       |rg AS (
       |  SELECT doc_id, unnest(list_concat(w, CASE WHEN len(w) >= 2
       |    THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
       |    ELSE [] END)) AS g
       |  FROM rw),
       |rgb AS (SELECT doc_id, ${md5BucketSql("g", buckets)} AS bucket FROM rg),
       |tw AS (SELECT list_filter(str_split(text, ' '), t -> t <> '') AS w
       |       FROM documents WHERE lang = 'en'),
       |tg AS (
       |  SELECT unnest(list_concat(w, CASE WHEN len(w) >= 2
       |    THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
       |    ELSE [] END)) AS g
       |  FROM tw),
       |tgb AS (SELECT ${md5BucketSql("g", buckets)} AS bucket FROM tg),
       |dn AS (SELECT doc_id, bucket, count(*) AS n FROM rgb GROUP BY doc_id, bucket),
       |cr AS (SELECT bucket, sum(n) AS cr FROM dn GROUP BY bucket),
       |ct AS (SELECT bucket, count(*) AS ct FROM tgb GROUP BY bucket),
       |tot AS (SELECT (SELECT CAST(sum(cr) AS DOUBLE) FROM cr) AS tr,
       |               (SELECT CAST(coalesce(sum(ct), 0) AS DOUBLE) FROM ct) AS tt),
       |lr AS (
       |  SELECT cr.bucket,
       |    ln((coalesce(ct, 0) + 1.0) / (tt + $buckets)) -
       |    ln((cr + 1.0) / (tr + $buckets)) AS lr
       |  FROM cr LEFT JOIN ct ON ct.bucket = cr.bucket CROSS JOIN tot),
       |wts AS (
       |  SELECT doc_id, round(sum(n * lr), 6) AS dsir_weight
       |  FROM dn JOIN lr USING (bucket) GROUP BY doc_id)""".stripMargin

  // ── BPE (CorpusOps.learnBpeMerges / applyBpePieceCounts) ────────────

  /** One left-to-right merge pass of rule `(a, b)` (columns of the
    * 1-row CTE `rule`) over a `syms` symbol list, as a `list_reduce`
    * fold: the accumulator is the output symbols joined by chr(31) (a
    * control char that can never appear in whitespace tokens); a step
    * either merges `x` into the accumulator's LAST symbol (when that
    * symbol is `a` and `x` is `b`) or appends `x`. Equivalent to
    * CorpusOps.mergePair's scan: after a merge the last symbol becomes
    * `a||b`, which can't immediately re-match a rule whose left is `a`
    * — the same non-overlap a j+=2 skip enforces. */
  private def mergePassSql(rule: String): String = {
    val acc = "str_split(acc, chr(31))"
    s"""str_split(list_reduce(syms, (acc, x) -> CASE
       |      WHEN $acc[-1] = $rule.a AND x = $rule.b
       |      THEN array_to_string(list_append($acc[1:len($acc)-1], $rule.a || $rule.b), chr(31))
       |      ELSE acc || chr(31) || x END), chr(31))""".stripMargin
  }

  /** DuckDB mirror of the full BPE TRAINING loop, UNROLLED: k is fixed
    * and small, so each iteration is a (pair-count → argmax → merge
    * pass) CTE pair — p_i holds merge rule i (ORDER BY cnt DESC, a, b
    * LIMIT 1 = the trainer's (-count, left, right) tie-break), s_i the
    * word table after applying it. Word frequencies come from the same
    * whitespace tokens as the trainer; symbols split per CODE POINT
    * (DuckDB substring is character-indexed), matching toSymbols.
    * Callers continue from `s$k` (the fully-segmented word table,
    * carrying w/freq/syms) and `p1..p$k` (the rules). */
  def bpeTrainingCtes(k: Int): String = {
    val head = Seq(
      """w0 AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w)""".stripMargin,
      """s0 AS (SELECT w, freq,
        |  list_transform(range(1, length(w) + 1), i -> substring(w, i, 1)) AS syms
        |  FROM w0)""".stripMargin)
    val iters = (1 to k).flatMap { i =>
      Seq(
        s"""p$i AS (
           |  SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
           |    SELECT unnest(list_transform(range(1, len(syms)),
           |             j -> {'a': syms[j], 'b': syms[j+1]})) AS pr, freq
           |    FROM s${i - 1})
           |  GROUP BY pr.a, pr.b ORDER BY cnt DESC, a, b LIMIT 1)""".stripMargin,
        // LEFT JOIN ON TRUE, not CROSS JOIN: when the corpus runs out
        // of pairs before iteration k the p_i CTE is EMPTY, and a
        // cross join would empty s_i (and every later word table) —
        // the Scala trainer stops early and keeps its word table, so
        // the oracle must too (NULL rule → identity pass)
        s"""s$i AS (SELECT w, freq,
           |  CASE WHEN p$i.a IS NULL THEN syms ELSE ${mergePassSql(s"p$i")} END AS syms
           |  FROM s${i - 1} LEFT JOIN p$i ON TRUE)""".stripMargin)
    }
    (head ++ iters).mkString(",\n")
  }

  /** The learned rule list as rows (merge_rank, left, right, merged,
    * pair_count) — the vocab_bpe_merges oracle body. */
  def bpeMergesSql(k: Int): String = {
    val union = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS merge_rank, a, b, cnt FROM p$i")
      .mkString(" UNION ALL ")
    s"""WITH ${bpeTrainingCtes(k)},
       |merges AS ($union)
       |SELECT merge_rank, a AS "left", b AS "right", a || b AS merged,
       |       cnt AS pair_count
       |FROM merges""".stripMargin
  }

  /** Train-then-apply round trip: the training chain's final word
    * table s$k IS the segmentation of every corpus word, so per-word
    * piece counts are just len(syms) — the vocab_bpe_apply oracle. */
  def bpeApplySql(k: Int): String =
    s"""WITH ${bpeTrainingCtes(k)},
       |pieces AS (SELECT w, len(syms) AS n_pieces FROM s$k),
       |tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(n_pieces) AS BIGINT) AS n_pieces
       |FROM tok JOIN pieces ON pieces.w = tok.token
       |WHERE token <> '' GROUP BY doc_id""".stripMargin

  /** The corpus-manifest oracle — shared by the batch query
    * (corpus_manifest) and its incrementally-maintained streaming twin
    * (stream_manifest), so the two semantics cannot drift. */
  lazy val manifestSql: String =
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS total_tokens,
       |  CAST(bit_xor(${rowDigestSql("doc_id", "text")}) AS BIGINT) AS content_digest,
       |  CAST(sum(${rowDigestSql("doc_id", "text")}) % 1152921504606846976 AS BIGINT)
       |    AS content_digest_sum
       |FROM documents GROUP BY source""".stripMargin

  /** Piece-frequency vocabulary off the training chain: the final word
    * table's symbols ARE the segmentation, so piece totals are one
    * unnest + weighted sum — the vocab_bpe_piece_freq oracle. */
  def bpePieceFreqSql(k: Int, topK: Int): String =
    s"""WITH ${bpeTrainingCtes(k)},
       |pf AS (SELECT unnest(syms) AS piece, freq FROM s$k)
       |SELECT piece, CAST(sum(freq) AS BIGINT) AS n_occurrences
       |FROM pf GROUP BY piece
       |ORDER BY n_occurrences DESC, piece LIMIT $topK""".stripMargin

  // ── Unigram LM (CorpusOps.trainUnigramLm / applyUnigramPieceCounts) ─

  /** One UNROLLED Viterbi DP chain under vocabulary CTE `vocabCte`
    * (columns piece/logp) with floor CTE `floorCte` (column fl):
    * `${p}_i` holds, per word of length ≥ i, the best (score, segs)
    * prefix ending at code point i — max over the last `maxPieceLen`
    * split points, score ties to the lexicographically smallest piece
    * list (the viterbiSegment tie-break). Length-1 pieces LEFT JOIN
    * with the floor fallback; longer pieces must be in the vocabulary.
    * `${p}_fin` is the full segmentation of every word (words longer
    * than `maxWordLen` would be DROPPED here — a loud row-count
    * mismatch against the engine, never a silent miscount). */
  private def unigramViterbiCtes(p: String, vocabCte: String,
      floorCte: String, maxPieceLen: Int, maxWordLen: Int): String = {
    val dp0 = s"""${p}_0 AS MATERIALIZED (SELECT w, len, freq, CAST(0 AS DOUBLE) AS score,
                 |  CAST([] AS VARCHAR[]) AS segs FROM wl)""".stripMargin
    val steps = (1 to maxWordLen).map { i =>
      val branches = (1 to math.min(maxPieceLen, i)).map { l =>
        val start = i - l + 1
        if (l == 1)
          s"""SELECT d.w, d.len, d.freq,
             |  d.score + coalesce(v.logp, (SELECT fl FROM $floorCte)) AS score,
             |  list_append(d.segs, substring(d.w, $i, 1)) AS segs
             |FROM ${p}_${i - 1} d LEFT JOIN $vocabCte v
             |  ON v.piece = substring(d.w, $i, 1)
             |WHERE d.len >= $i""".stripMargin
        else
          s"""SELECT d.w, d.len, d.freq, d.score + v.logp AS score,
             |  list_append(d.segs, substring(d.w, $start, $l)) AS segs
             |FROM ${p}_${i - l} d JOIN $vocabCte v
             |  ON v.piece = substring(d.w, $start, $l)
             |WHERE d.len >= $i""".stripMargin
      }
      s"""${p}_$i AS MATERIALIZED (
         |  SELECT w, len, freq, score, segs FROM (
         |    SELECT *, row_number() OVER (PARTITION BY w
         |      ORDER BY score DESC, segs) AS rn
         |    FROM (${branches.mkString("\n    UNION ALL\n    ")}))
         |  WHERE rn = 1)""".stripMargin
    }
    val fin = (1 to maxWordLen)
      .map(i => s"SELECT w, freq, segs FROM ${p}_$i WHERE len = $i")
      .mkString("\n  UNION ALL\n  ")
    (Seq(dp0) ++ steps :+ s"${p}_fin AS MATERIALIZED (\n  $fin)").mkString(",\n")
  }

  /** DuckDB mirror of the full unigram-LM TRAINING trajectory,
    * unrolled like [[bpeTrainingCtes]]: substring-frequency seed (top
    * `seedSize` ∪ all single code points), then `emRounds` hard-EM
    * rounds — each a full Viterbi DP chain under the previous round's
    * vocabulary, piece-count aggregation, count-pruning to `vocabSize`
    * (singles always kept), and add-one re-smoothing with the 6-dp
    * logp round. Callers continue from `vocab_$emRounds` /
    * `vfl_$emRounds` (and may append one more [[unigramViterbiCtes]]
    * chain for the apply half). */
  def unigramTrainingCtes(seedSize: Int, vocabSize: Int, emRounds: Int,
      maxPieceLen: Int, maxWordLen: Int): String = {
    val head = Seq(
      """w0 AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w)""".stripMargin,
      "wl AS MATERIALIZED (SELECT w, length(w) AS len, freq FROM w0)",
      s"""sub0 AS (
         |  SELECT substring(w, s.i, l.j) AS piece, freq
         |  FROM wl, unnest(range(1, len + 1)) s(i),
         |       unnest(range(1, $maxPieceLen + 1)) l(j)
         |  WHERE s.i + l.j - 1 <= len)""".stripMargin,
      """seed0 AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
        |          FROM sub0 GROUP BY piece)""".stripMargin,
      s"""keep_0 AS MATERIALIZED (
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
         |    FROM seed0) WHERE rn <= $seedSize
         |  UNION
         |  SELECT piece, cnt FROM seed0 WHERE length(piece) = 1)""".stripMargin) ++
      vocabCtes(0)
    val rounds = (1 to emRounds).flatMap { r =>
      Seq(
        unigramViterbiCtes(s"dp$r", s"vocab_${r - 1}", s"vfl_${r - 1}",
          maxPieceLen, maxWordLen),
        s"""cnt_$r AS MATERIALIZED (
           |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
           |  FROM (SELECT unnest(segs) AS piece, freq FROM dp${r}_fin)
           |  GROUP BY piece)""".stripMargin,
        s"""keep_$r AS MATERIALIZED (
           |  SELECT piece, cnt FROM (
           |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
           |    FROM cnt_$r) WHERE rn <= $vocabSize
           |  UNION
           |  SELECT v.piece, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
           |  FROM vocab_${r - 1} v LEFT JOIN cnt_$r c USING (piece)
           |  WHERE length(v.piece) = 1)""".stripMargin) ++ vocabCtes(r)
    }
    (head ++ rounds).mkString(",\n")
  }

  /** The smoothed-probability triple off a `keep_$r` count table:
    * totals, 6-dp logp per piece, and the zero-count floor. */
  private def vocabCtes(r: Int): Seq[String] = Seq(
    s"vstat_$r AS MATERIALIZED (SELECT CAST(sum(cnt) AS DOUBLE) AS t, " +
      s"CAST(count(*) AS DOUBLE) AS v FROM keep_$r)",
    s"""vocab_$r AS MATERIALIZED (SELECT piece, cnt,
       |  round(ln((cnt + 1.0) / (t + v)), 6) AS logp
       |FROM keep_$r CROSS JOIN vstat_$r)""".stripMargin,
    s"vfl_$r AS MATERIALIZED (SELECT round(ln(1.0 / (t + v)), 6) AS fl FROM vstat_$r)")

  /** The trained vocabulary as rows — the vocab_unigram_lm oracle. */
  def unigramVocabSql(seedSize: Int, vocabSize: Int, emRounds: Int,
      maxPieceLen: Int, maxWordLen: Int): String =
    s"""WITH ${unigramTrainingCtes(seedSize, vocabSize, emRounds, maxPieceLen, maxWordLen)}
       |SELECT piece, cnt AS n_occurrences, logp FROM vocab_$emRounds""".stripMargin

  /** Train-then-apply round trip: one more Viterbi chain under the
    * FINAL vocabulary segments every corpus word; per-document piece
    * counts follow the bpeApplySql join shape. */
  def unigramApplySql(seedSize: Int, vocabSize: Int, emRounds: Int,
      maxPieceLen: Int, maxWordLen: Int): String =
    s"""WITH ${unigramTrainingCtes(seedSize, vocabSize, emRounds, maxPieceLen, maxWordLen)},
       |${unigramViterbiCtes("ap", s"vocab_$emRounds", s"vfl_$emRounds", maxPieceLen, maxWordLen)},
       |pieces AS (SELECT w, len(segs) AS n_pieces FROM ap_fin),
       |tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(n_pieces) AS BIGINT) AS n_pieces
       |FROM tok JOIN pieces ON pieces.w = tok.token
       |WHERE token <> '' GROUP BY doc_id""".stripMargin

  /** Piece-frequency vocabulary off the apply chain's segmentations —
    * the vocab_unigram_piece_freq oracle (bpePieceFreqSql's shape on
    * the unigram decode). */
  def unigramPieceFreqSql(seedSize: Int, vocabSize: Int, emRounds: Int,
      maxPieceLen: Int, maxWordLen: Int, topK: Int): String =
    s"""WITH ${unigramTrainingCtes(seedSize, vocabSize, emRounds, maxPieceLen, maxWordLen)},
       |${unigramViterbiCtes("ap", s"vocab_$emRounds", s"vfl_$emRounds", maxPieceLen, maxWordLen)},
       |pf AS (SELECT unnest(segs) AS piece, freq FROM ap_fin)
       |SELECT piece, CAST(sum(freq) AS BIGINT) AS n_occurrences
       |FROM pf GROUP BY piece
       |ORDER BY n_occurrences DESC, piece LIMIT $topK""".stripMargin

  /** DuckDB mirror of Dedup.nearDupPairs over a corpus CTE named
    * `corpus(doc_id, text)`: bigram shingles → 12-hash signature →
    * 4×3 bands with the 64-bucket skew cap → verified Jaccard pairs.
    * Emits the tok/sh/sig/bands/sized/cand/pairs chain; callers SELECT
    * from `pairs` (id_a, id_b, jaccard). */
  val minhashLshPairsCte: String = minhashLshCte(cap = Some(64))

  /** The cap-free variant, mirroring the INCREMENTAL (streaming) LSH:
    * an increment-at-a-time pipeline can't apply a global bucket-size
    * cap — bucket sizes are only known once the whole corpus has
    * arrived — so its candidate set is the raw bucket-collision set. */
  val minhashLshPairsNoCapCte: String = minhashLshCte(cap = None)

  private def minhashLshCte(cap: Option[Int]): String = {
    val candCte = cap match {
      case Some(c) =>
        s"""sized AS (SELECT doc_id, band, bh,
           |            count(*) OVER (PARTITION BY band, bh) AS bsz FROM bands),
           |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |         FROM sized a JOIN sized b
           |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
           |         WHERE a.bsz <= $c)""".stripMargin
      case None =>
        """cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          |         FROM bands a JOIN bands b
          |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin
    }
    s"""tok AS (SELECT doc_id, str_split(text, ' ') AS w FROM corpus),
       |sh AS (SELECT doc_id,
       |         list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS shingles
       |       FROM tok),
       |sig AS (SELECT doc_id, shingles,
       |          list_transform(range(0, 12), i ->
       |            list_min(list_transform(shingles, s -> md5(i || ':' || s)))) AS sig
       |        FROM sh),
       |bands AS (SELECT doc_id, bs.b AS band,
       |            md5(sig[3*bs.b+1] || sig[3*bs.b+2] || sig[3*bs.b+3]) AS bh
       |          FROM sig, (SELECT unnest(range(0, 4)) AS b) bs),
       |$candCte,
       |pairs AS (SELECT id_a, id_b,
       |            CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
       |              / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
       |          FROM cand
       |          JOIN sh sa ON sa.doc_id = cand.id_a
       |          JOIN sh sb ON sb.doc_id = cand.id_b)""".stripMargin
  }
}
