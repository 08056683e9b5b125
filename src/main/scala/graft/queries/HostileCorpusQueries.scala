package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Exact._

/** Hostile-CORPUS gates: the q_hostile_* adversarial discipline
  * (AdvancedQueries) extended to the LLM-operator surface. The seven r11
  * hostile gates cover SQL semantics; these cover what a 100 TB web crawl
  * actually throws at the dedup/text pipelines — and what the driver's
  * clean synthetic documents can never exercise (the reference's tutorial
  * premise is arbitrary user bytes: /root/reference/README.md:25-34).
  *
  * The hostile slice is constructed IN-ENGINE, identically on both sides
  * (the same `repeat`/`rtrim`/hex-decode expression text runs in Spark SQL
  * and DuckDB), then UNIONed with real documents rows so degenerate and
  * clean data meet in the same pipeline:
  *
  *  - 9000001 the EMPTY document ('')
  *  - 9000002 a whitespace-only document ('   ' — splits to 4 empty tokens)
  *  - 9000003 one token repeated 100 000 times ('tok' — a single distinct
  *            shingle, 12 500 identical 8-word segments)
  *  - 9000004 a ~10 MiB document (a 99-char token × 100 000)
  *  - 9000005 a 4-byte-UTF-8-only document (U+1F600 × 3 per token × 50 —
  *            char-counted slicing/length vs byte-oriented hashing)
  *  - 9000006/9000007 a planted near-dup pair (20 shared words + 1 unique
  *            → word-3-shingle Jaccard exactly 18/20 = 0.9)
  *  - 9000008 an EXACT duplicate of 9000006 (Jaccard 1.0, every band hits)
  *  - 9000009 one 8×'tok' segment — the cross-doc boilerplate seed that
  *            deletes ALL 12 500 segments of 9000003
  *  - 9000010 one 8×(99-char token) segment — same seed for the 10 MiB doc
  *
  * Each gate runs the PRODUCTION operator code (SimilarityQueries
  * .minhashPairs, TextQueries.lineDedupOf/chunksOf, LearnQueries
  * .unigramFromWf — parameterized, not copied) and the oracle replays the
  * identical construction + pipeline in DuckDB, so the hash gate pins the
  * engines' agreement on degenerate text end-to-end. InvariantsSpec
  * additionally pins the PLANTED values (the 12 500-segment collapse, the
  * 0.9/1.0 Jaccards, the empty doc's exclusion, the engineered Viterbi
  * tie) so a both-engines-wrong drift cannot pass silently.
  *
  * Scale notes: every hostile doc is O(1) rows; the 10 MiB body flows
  * through the same bounded per-row transforms the production queries use
  * (shingle arrays are distinct-collapsed before explode; chunk slices are
  * 64 tokens; dropped docs never materialize a reassembly list). The one
  * deliberate stressor is a 30 MB transient ngrams array on the 10 MiB
  * row — the documented per-row memory bound of word-shingling without a
  * doc-length cap.
  */
object HostileCorpusQueries {

  /** (doc_id, text-expression) rows; expression text is valid in BOTH
    * Spark SQL and DuckDB given the engine's 4-byte-char spelling `em`
    * (U+1F600 GRINNING FACE, constructed from hex so no literal leaves
    * the ASCII source).
    */
  private def docRows(em: String): Seq[(Long, String)] = {
    val common20 = (1 to 20).map(i => f"w$i%02d").mkString(" ")
    Seq(
      9000001L -> "''",
      9000002L -> "'   '",
      9000003L -> "rtrim(repeat('tok ', 100000))",
      9000004L -> "rtrim(repeat(repeat('x', 99) || ' ', 100000))",
      9000005L -> s"rtrim(repeat(repeat($em, 3) || ' ', 50))",
      9000006L -> s"'$common20 uniqa'",
      9000007L -> s"'$common20 uniqb'",
      9000008L -> s"'$common20 uniqa'",
      9000009L -> "rtrim(repeat('tok ', 8))",
      9000010L -> "rtrim(repeat(repeat('x', 99) || ' ', 8))"
    )
  }

  private val sparkEm = "decode(unhex('F09F9880'), 'UTF-8')"
  private val duckEm = "decode(from_hex('F09F9880'))"

  private def hostileSelect(em: String): String =
    docRows(em).map { case (id, e) =>
      s"SELECT CAST($id AS BIGINT) AS doc_id, $e AS text"
    }.mkString("\nUNION ALL\n")

  /** The hostile slice ∪ real documents with doc_id < maxReal (Spark). */
  private def hostileUnion(s: SparkSession, dir: String, maxReal: Int): DataFrame =
    s.sql(hostileSelect(sparkEm)).unionByName(
      Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .filter(col("doc_id") < maxReal))

  /** The same union as a DuckDB CTE body (MATERIALIZED — multiple
    * consumers must not re-expand the 10 MiB repeat).
    */
  private def duckDocsCte(maxReal: Int): String =
    s"""docs_h AS MATERIALIZED (
       |${hostileSelect(duckEm)}
       |UNION ALL
       |SELECT doc_id, text FROM documents WHERE doc_id < $maxReal)""".stripMargin

  private val hostileIdValues: String =
    docRows("''").map(r => s"(${r._1})").mkString(", ")

  // ------------------------------------------------------- minhash-lsh --

  /** MinHash-LSH banding over the hostile slice — the production
    * qMinhashLsh pipeline (8 md5 permutation-mins, 4 bands × 2 rows,
    * exact-Jaccard verify at 0.8) via [[SimilarityQueries.minhashPairs]].
    * Pinned semantics: the empty doc is EXCLUDED (below the 3-token
    * shingling floor — 'shingles' diag row 0); the whitespace doc shingles
    * to the single degenerate '  ' (two spaces); mono/10 MiB/UTF-8 docs
    * each collapse to ONE distinct shingle, and 9000003↔9000009 share
    * exactly that shingle set → Jaccard 1.0 through the real banding;
    * the planted pair scores exactly 0.9; the exact duplicate 1.0.
    */
  def qHostileCorpusDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = hostileUnion(s, dir, 30)
    val pairs = SimilarityQueries.minhashPairs(docs)
      .select(lit("pair").as("probe"), col("doc_a").as("a"), col("doc_b").as("b"),
        r6(col("jaccard")).as("v"))
    val sizes = SimilarityQueries.shinglesOf(docs)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    import s.implicits._
    val diag = docRows("''").map(_._1).toDF("doc_id")
      .join(sizes, Seq("doc_id"), "left")
      .select(lit("shingles").as("probe"), col("doc_id").as("a"),
        lit(null).cast("long").as("b"),
        coalesce(col("n_sh"), lit(0L)).cast("double").as("v"))
    pairs.unionByName(diag)
  }

  // Oracle note (all three doc gates): the production documents oracles
  // spell shingles/segments/chunks as a lateral UNNEST over the token
  // LIST, which duplicates the list per output row — harmless on ≤1 KB
  // docs, ~1 TB of copies for the 10 MiB doc (measured: the first spelling
  // of this oracle did not finish). These oracles therefore use TOKEN ROWS
  // (zipped unnest of tokens and positions) and reconstruct shingles via
  // position self-joins, segments/chunks via ORDER BY pos string_agg —
  // the same values, linear data movement.
  val qHostileCorpusDedupSql: String =
    s"""WITH ${duckDocsCte(30)},
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |               unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
       |        FROM docs_h),
       |sh AS (SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
       |       FROM tok a
       |       JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |       JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
       |sig AS (SELECT doc_id,
       |  min(md5('0:' || shingle)) AS h0,  min(md5('1:' || shingle)) AS h1,
       |  min(md5('2:' || shingle)) AS h2,  min(md5('3:' || shingle)) AS h3,
       |  min(md5('4:' || shingle)) AS h4,  min(md5('5:' || shingle)) AS h5,
       |  min(md5('6:' || shingle)) AS h6,  min(md5('7:' || shingle)) AS h7
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, h0||h1 AS bkey FROM sig UNION ALL
       |  SELECT doc_id, 1, h2||h3 FROM sig UNION ALL
       |  SELECT doc_id, 2, h4||h5 FROM sig UNION ALL
       |  SELECT doc_id, 3, h6||h7 FROM sig),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey
       |         WHERE x.doc_id < y.doc_id),
       |inter AS (SELECT doc_a, doc_b, count(*) AS inter
       |          FROM cand JOIN sh sa ON doc_a = sa.doc_id
       |          JOIN sh sb ON doc_b = sb.doc_id AND sa.shingle = sb.shingle
       |          GROUP BY doc_a, doc_b),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |hids AS (SELECT * FROM (VALUES $hostileIdValues) v(doc_id))
       |SELECT 'pair' AS probe, doc_a AS a, doc_b AS b,
       |  ROUND(CAST(inter AS DOUBLE) / (za.n_sh + zb.n_sh - inter), 6) AS v
       |FROM inter JOIN sizes za ON doc_a = za.doc_id
       |JOIN sizes zb ON doc_b = zb.doc_id
       |WHERE CAST(inter AS DOUBLE) / (za.n_sh + zb.n_sh - inter) >= 0.8
       |UNION ALL
       |SELECT 'shingles', CAST(h.doc_id AS BIGINT), CAST(NULL AS BIGINT),
       |  CAST(COALESCE(s.n_sh, 0) AS DOUBLE)
       |FROM hids h LEFT JOIN sizes s ON s.doc_id = h.doc_id""".stripMargin

  // -------------------------------------------------------- line-dedup --

  /** Line-level dedup + reassembly over the hostile slice — the production
    * [[TextQueries.lineDedupOf]] (8-word segments, cross-doc df>=2 drop,
    * in-order rejoin, per-doc sha256 gate). Pinned semantics: the single
    * 8×'tok' seed 9000009 deletes EVERY one of 9000003's 12 500 segments
    * (and 9000010 the 10 MiB doc's) — both reassemble to the EMPTY string,
    * sha-pinned; the exact-duplicate pair drops whole; the near-dup
    * neighbor keeps exactly its one differing tail segment; within-doc
    * repetition (the UTF-8 doc's 6 identical segments) is NOT boilerplate
    * — df counts distinct docs — so it must stay out of the result.
    */
  def qHostileCorpusLines(s: SparkSession, dir: String): DataFrame =
    TextQueries.lineDedupOf(hostileUnion(s, dir, 30))

  val qHostileCorpusLinesSql: String =
    s"""WITH ${duckDocsCte(30)},
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |               unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
       |        FROM docs_h),
       |segs AS (
       |  SELECT doc_id, (pos - 1) // 8 AS seg_no,
       |         string_agg(tok, ' ' ORDER BY pos) AS seg
       |  FROM tok GROUP BY doc_id, (pos - 1) // 8),
       |bp AS (SELECT seg FROM segs GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= 2),
       |kept AS (SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM bp)),
       |tot AS (SELECT doc_id, COUNT(*) AS n_segs FROM segs GROUP BY doc_id),
       |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
       |          string_agg(seg, ' ' ORDER BY seg_no) AS new_text
       |        FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, CAST(t.n_segs AS BIGINT) AS n_segs,
       |  CAST(t.n_segs - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped,
       |  CAST(len(COALESCE(r.new_text, '')) AS BIGINT) AS new_len,
       |  sha256(COALESCE(r.new_text, '')) AS new_sha
       |FROM tot t LEFT JOIN reb r USING (doc_id)
       |WHERE t.n_segs - COALESCE(r.n_kept, 0) > 0""".stripMargin

  // ----------------------------------------------------------- chunking --

  /** Chunking offsets over the hostile slice — the production
    * [[TextQueries.chunksOf]] (width 64, stride 48, per-chunk sha256).
    * Pinned semantics: the EMPTY doc still yields exactly ONE chunk (its
    * single empty token — sha256('')); the whitespace doc one chunk whose
    * text is the original three spaces (4 empty tokens rejoined); the
    * 100 000-token mono and 10 MiB docs chunk to exactly
    * ⌈(100000−64)/48⌉+1 = 2083 windows (the last lands exactly full:
    * 2082·48+64 = 100000); the 50-token UTF-8 doc one 50-token chunk
    * whose sha crosses the char-counted-slice / byte-hashed boundary.
    */
  def qHostileCorpusChunk(s: SparkSession, dir: String): DataFrame =
    TextQueries.chunksOf(hostileUnion(s, dir, 5))

  // Token→chunk mapping: with width 64 > stride 48 each token belongs to
  // at most two chunks — chunk c covers pos ∈ [c·48+1, c·48+64], so
  // c ∈ [max(⌈(pos−64)/48⌉, 0), (pos−1)//48], capped below n_chunks.
  // An equi-group per (doc, chunk) replaces the per-chunk list slice.
  val qHostileCorpusChunkSql: String =
    s"""WITH ${duckDocsCte(5)},
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |               unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
       |        FROM docs_h),
       |n AS (SELECT doc_id,
       |        (GREATEST(COUNT(*) - 64, 0) + 47) // 48 + 1 AS n_chunks
       |      FROM tok GROUP BY doc_id),
       |tc AS (SELECT doc_id, pos, tok,
       |         unnest(range(GREATEST(CAST(ceil((pos - 64) / 48.0) AS BIGINT), 0),
       |                      (pos - 1) // 48 + 1)) AS chunk
       |       FROM tok)
       |SELECT t.doc_id, CAST(t.chunk AS INT) AS chunk,
       |  CAST(COUNT(*) AS INT) AS chunk_tokens,
       |  sha256(string_agg(t.tok, ' ' ORDER BY t.pos)) AS chunk_sha
       |FROM tc t JOIN n ON n.doc_id = t.doc_id AND t.chunk < n.n_chunks
       |GROUP BY t.doc_id, t.chunk""".stripMargin

  // -------------------------------------------------- unigram-segmenter --

  /** (w, cnt) rows for the hostile word set; expression text valid in both
    * engines given `em`:
    *  - 12×'a' — run-piece explosion at the DP's 12-char unroll boundary
    *  - 'abab'/'baba' — symmetric counts (pc(ab) = pc(ba) by construction)
    *  - 3×U+1F600 — 4-byte chars through char-counted substring/len
    *  - 'aab', singleton 'q' — asymmetric small pieces, a count-1 char
    *  - 'juklm' — 5 chars, every substring unique to it, so ALL four
    *    2-piece Viterbi paths tie EXACTLY and only the lexicographic path
    *    tie-break decides ('jukl|m' — '|' sorts above letters, so the
    *    longest-first-piece path is the smallest string)
    */
  private def wordRows(em: String): Seq[(String, Long)] = Seq(
    "'aaaaaaaaaaaa'" -> 5L,
    "'abab'" -> 3L,
    "'baba'" -> 3L,
    s"repeat($em, 3)" -> 4L,
    "'aab'" -> 2L,
    "'q'" -> 1L,
    "'juklm'" -> 7L
  )

  private def wordSelect(em: String): String =
    wordRows(em).map { case (w, c) =>
      s"SELECT $w AS w, CAST($c AS BIGINT) AS cnt"
    }.mkString("\nUNION ALL\n")

  /** Unigram-LM Viterbi segmentation over the hostile word set — the
    * production [[LearnQueries.unigramFromWf]] lattice (integer-LN decimal
    * piece scores, 12 DP rounds, path tie-break) with piece floor 1 so
    * every degenerate substring becomes a live piece. The oracle replays
    * the full 12-round DP via [[LearnQueries.unigramCtesFor]] over the
    * identical in-engine word construction.
    */
  def qHostileCorpusSegment(s: SparkSession, dir: String): DataFrame = {
    val wf = s.sql(wordSelect(sparkEm))
    val (_, seg) = LearnQueries.unigramFromWf(wf, minCount = 1)
    seg.select(col("w").as("word"), col("cnt"), col("seg"),
      size(split(col("seg"), "\\|")).cast("long").as("n_pieces"),
      r6(col("sc").cast("double")).as("score"))
  }

  val qHostileCorpusSegmentSql: String =
    LearnQueries.unigramCtesFor(wordSelect(duckEm), minCount = 1) + """
      |SELECT wf.w AS word, wf.cnt AS cnt, substring(b.path, 2) AS seg,
      |  CAST(len(string_split(substring(b.path, 2), '|')) AS BIGINT) AS n_pieces,
      |  ROUND(CAST(b.sc AS DOUBLE), 6) AS score
      |FROM wf JOIN ball12 b ON b.w = wf.w AND b.j = len(wf.w)""".stripMargin

  // ------------------------------------------------------------ registry --

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_hostile_corpus_dedup" -> ((qHostileCorpusDedup _, Some(qHostileCorpusDedupSql))),
    "q_hostile_corpus_lines" -> ((qHostileCorpusLines _, Some(qHostileCorpusLinesSql))),
    "q_hostile_corpus_chunk" -> ((qHostileCorpusChunk _, Some(qHostileCorpusChunkSql))),
    "q_hostile_corpus_segment" -> ((qHostileCorpusSegment _, Some(qHostileCorpusSegmentSql)))
  )
}
