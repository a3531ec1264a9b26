package graft

/** DuckDB oracle SQL, one statement per entry in [[SparkEntry.queries]].
  * Column names/aliases match the Spark side exactly (the driver's
  * compare sorts columns by name). Integer aggregates are CAST to
  * BIGINT (DuckDB sum(int) widens to HUGEINT), row_number to INT
  * (DuckDB's is BIGINT), and all engine hashing uses the portable
  * 56-bit md5-prefix form so both engines compute identical values.
  */
object OracleSql {

  /** DuckDB rendering of graft.codec.Codecs.portableHash. */
  private def dh(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 14) AS BIGINT)"

  /** Shared context-enrichment CTEs (mirror of ContextOps.enrichEvents
    * + setBaggage over the events table). */
  private val REC = """WITH rec0 AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value,
         CAST(floor(value) AS BIGINT) AS value_int,
         substr(md5(CAST(event_id AS VARCHAR)), 1, 16) AS trace_id
  FROM events
), rec AS (
  SELECT *,
         substr(md5(trace_id || '-producer'), 1, 16) AS parent_id,
         substr(md5(trace_id || '-set'), 1, 16) AS span_id,
         'messageid_' || CAST(value_int AS VARCHAR) AS messageid
  FROM rec0
), evens AS (SELECT * FROM rec WHERE value_int % 2 = 0
), odds AS (SELECT * FROM rec WHERE value_int % 2 <> 0 OR value_int IS NULL)"""

  /** Shared tokenization CTE (mirror of Codecs.tokens). */
  private val TOKS = """WITH toks AS (
  SELECT doc_id, lang, text,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> len(t) > 0) AS tk
  FROM documents
)"""

  /** Quality-score formula over (text, tk) — mirror of
    * TextOps.qualityScore, shared by t_quality and t_lang_stats. */
  private val QUALITY = """least(len(tk) / 50.0, 1.0) * 0.5 +
  (CASE WHEN len(tk) > 0
        THEN CAST(len(list_filter(tk, t -> t IN ('the','and','of','to','is','in','a'))) AS DOUBLE) / len(tk)
        ELSE 0.0 END) * 0.3 +
  (1.0 - least(CASE WHEN length(text) > 0
                    THEN CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / length(text)
                    ELSE 0.0 END, 1.0)) * 0.2"""

  /** n-gram shingle list over `tk` (mirror of Codecs.shingles). */
  private def shinglesN(n: Int): String =
    s"list_transform(range(1, greatest(len(tk)-${n - 1}, 0)+1), i -> array_to_string(tk[i:i+${n - 1}], ' '))"
  private val SHINGLES3 = shinglesN(3)

  /** Shingle-hash CTEs shared by jaccard/minhash. */
  private val SH = s"""$TOKS, sh AS (
  SELECT doc_id, unnest(list_distinct($SHINGLES3)) AS s FROM toks
), h AS (SELECT doc_id, ${dh("s")} AS h FROM sh)"""

  /** Matched-positions CTE chain of the cross-doc substring family
    * (mirror of Dedup.substringMatches at n=5, maxLcp=30): suffixes
    * capped at 30 tokens sorted within leading-5-gram buckets; the
    * longest cross-doc match at a position is its LCP against the
    * nearest other-doc suffix at the same-doc run boundaries.
    * list_zip pads with NULL (counts as mismatch); list_position
    * returns 0 when not found = arrays equal through the shorter
    * length; string sort is binary UTF-8 in both engines. Ends at
    * `mm(doc_id, pos, match_len, sub)`. */
  /** Shared w0..mm window chain of the substring families (token AND
    * char units), picking up from an `sfx(doc_id, pos, h, s, s_str)`
    * CTE: same-doc runs in bucket suffix order, boundary neighbors,
    * zip-LCP, matches ≥ `minLen` units. `sep` re-joins the matched
    * unit slice (" " for tokens, "" for chars). */
  private def substrWindowTail(minLen: Int, sep: String): String = s"""w0 AS (
  SELECT doc_id, pos, h, s, s_str,
         lag(s) OVER wb AS prev_s,
         lead(s) OVER wb AS next_s,
         CASE WHEN lag(doc_id) OVER wb IS NULL
                OR lag(doc_id) OVER wb <> doc_id THEN 1 ELSE 0 END AS chg
  FROM sfx
  WINDOW wb AS (PARTITION BY h ORDER BY s_str, doc_id, pos)
), w1 AS (
  SELECT doc_id, pos, h, s, s_str, prev_s, next_s,
         sum(chg) OVER (PARTITION BY h ORDER BY s_str, doc_id, pos) AS run
  FROM w0
), w2 AS (
  SELECT doc_id, pos, s,
         first_value(prev_s) OVER wr AS prev_other,
         last_value(next_s) OVER (PARTITION BY h, run ORDER BY s_str, doc_id, pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS next_other
  FROM w1
  WINDOW wr AS (PARTITION BY h, run ORDER BY s_str, doc_id, pos)
), lp AS (
  SELECT doc_id, pos, s,
         CASE WHEN prev_other IS NULL THEN NULL
              ELSE list_position(list_transform(list_zip(s, prev_other),
                z -> CASE WHEN z[1] IS NULL OR z[2] IS NULL THEN false ELSE z[1] = z[2] END), false) END AS pp,
         CASE WHEN prev_other IS NULL THEN NULL ELSE least(len(s), len(prev_other)) END AS pl,
         CASE WHEN next_other IS NULL THEN NULL
              ELSE list_position(list_transform(list_zip(s, next_other),
                z -> CASE WHEN z[1] IS NULL OR z[2] IS NULL THEN false ELSE z[1] = z[2] END), false) END AS np,
         CASE WHEN next_other IS NULL THEN NULL ELSE least(len(s), len(next_other)) END AS nl
  FROM w2
), mm AS (
  SELECT doc_id, pos, CAST(match_len AS BIGINT) AS match_len,
         array_to_string(s[1:CAST(match_len AS INT)], '$sep') AS sub
  FROM (SELECT doc_id, pos, s,
          greatest(coalesce(CASE WHEN pp = 0 THEN pl ELSE pp - 1 END, 0),
                   coalesce(CASE WHEN np = 0 THEN nl ELSE np - 1 END, 0)) AS match_len
        FROM lp)
  WHERE match_len >= $minLen
)"""

  /** Shared BPE-encode chain: token occurrences → one-round merge
    * table (top-20 pairs, rank-ordered) → vocabulary segmented by a
    * recursive CTE over merge rounds. The round transition is the
    * greedy left-to-right non-overlapping merge pass, written as a
    * list_reduce over the chr(31)-separated symbol string: append the
    * next char, or fuse it with the previous SYMBOL when (prev, next)
    * is exactly the pair (whole-symbol match via the last-[^sep]-run
    * regex). Independent of the engine's nested-fold form. */
  private val BPE = s"""$TOKS, tkc AS (
  SELECT doc_id, unnest(tk) AS tok FROM toks
), pc AS (
  SELECT doc_id, tok, count(*) AS cnt FROM tkc GROUP BY 1, 2
), mg AS (
  SELECT pair, CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT) AS rank FROM (
    SELECT pair, count(*) AS n FROM (
      SELECT unnest(list_transform(range(1, length(tok)),
                    i -> substr(tok, CAST(i AS INT), 2))) AS pair
      FROM tkc)
    GROUP BY 1 ORDER BY n DESC, pair LIMIT 20)
), enc AS (
  WITH RECURSIVE r(tok, round, symstr) AS (
    SELECT tok, 0, array_to_string(list_transform(range(1, length(tok)+1),
             i -> substr(tok, CAST(i AS INT), 1)), chr(31))
    FROM (SELECT DISTINCT tok FROM tkc)
    UNION ALL
    SELECT r.tok, r.round + 1,
      list_reduce(string_split(r.symstr, chr(31)), (acc, x) -> CASE
        WHEN regexp_extract(acc, '([^' || chr(31) || ']*)$$', 1) = substr(m.pair, 1, 1)
             AND x = substr(m.pair, 2, 1)
        THEN CASE WHEN acc = substr(m.pair, 1, 1) THEN m.pair
                  ELSE regexp_replace(acc, chr(31) || '[^' || chr(31) || ']*$$', '')
                       || chr(31) || m.pair END
        ELSE acc || chr(31) || x END)
    FROM r JOIN mg m ON m.rank = r.round + 1
  )
  SELECT tok, string_split(symstr, chr(31)) AS subs,
         CAST(len(string_split(symstr, chr(31))) AS BIGINT) AS n_sub
  FROM r WHERE round = (SELECT count(*) FROM mg)
)"""

  private val SUBSTR_M = s"""$TOKS, posn AS (
  SELECT doc_id, unnest(range(1, greatest(len(tk)-4, 0)+1)) AS i, tk FROM toks
), g AS (
  SELECT doc_id, CAST(i-1 AS BIGINT) AS pos, tk,
         ${dh("array_to_string(tk[i:i+4], ' ')")} AS h
  FROM posn
), xdup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), sfx AS (
  SELECT doc_id, pos, h,
         tk[CAST(pos+1 AS INT):CAST(pos+30 AS INT)] AS s,
         array_to_string(tk[CAST(pos+1 AS INT):CAST(pos+30 AS INT)], ' ') AS s_str
  FROM g WHERE h IN (SELECT h FROM xdup)
), ${substrWindowTail(5, " ")}"""

  /** Char-level matched-positions chain (mirror of
    * Dedup.substringMatchesChar at n=20, maxLcp=80): positions over
    * the lowercase-trimmed character stream, leading-20-char gram
    * hashed directly from the string, suffixes capped at 80 chars.
    * Shares [[substrWindowTail]] with the token chain. */
  private val SUBSTR_CHAR_M = s"""WITH nx AS (
  SELECT doc_id, lower(trim(text)) AS txt FROM documents
), posn AS (
  SELECT doc_id, txt, unnest(range(0, greatest(length(txt)-19, 0))) AS pos FROM nx
), g AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos, txt,
         ${dh("substr(txt, CAST(pos+1 AS INT), 20)")} AS h
  FROM posn
), xdup AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), sfx AS (
  SELECT doc_id, pos, h,
         string_split(substr(txt, CAST(pos+1 AS INT), 80), '') AS s,
         substr(txt, CAST(pos+1 AS INT), 80) AS s_str
  FROM g WHERE h IN (SELECT h FROM xdup)
), ${substrWindowTail(20, "")}"""

  /** Interval-union island sweep over `mm` (matches overlap and nest),
    * continuing SUBSTR_M: running max of interval ends per doc, break
    * where a start clears it. Ends at `sp(doc_id, s0, e0)`. */
  private val SUBSTR_ISL = """iv AS (
  SELECT doc_id, pos, pos + match_len - 1 AS e FROM mm
), pe AS (
  SELECT doc_id, pos, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM iv
), br AS (
  SELECT doc_id, pos, e,
         CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END AS brk
  FROM pe
), isl AS (
  SELECT doc_id, pos, e,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM br
), sp AS (
  SELECT doc_id, min(pos) AS s0, max(e) AS e0 FROM isl GROUP BY doc_id, island
)"""

  /** Multi-target DSIR weight chain (mirror of
    * TextOps.dsirWeightsMulti over source-slice targets, vBuckets
    * 1024; smoothing identical to DSIR_W). Ends at
    * `w(doc_id, target, n_grams, log_w)`. */
  private def dsirMultiW(targets: Seq[String], rel: String = "documents") = s"""WITH dtoks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk
  FROM $rel
), occ AS (
  SELECT doc_id, source, unnest(${shinglesN(2)}) AS g FROM dtoks
), pd AS (
  SELECT doc_id, source, ${dh("g")} % 1024 AS b, count(*) AS c_db
  FROM occ GROUP BY 1, 2, 3
), tgts AS (SELECT unnest([${targets.map("'" + _ + "'").mkString(", ")}]) AS target
), bs AS (SELECT b, sum(c_db) AS c_c FROM pd GROUP BY b
), ct AS (
  SELECT t.target, p.b,
         sum(CASE WHEN p.source = t.target THEN p.c_db ELSE 0 END) AS c_t
  FROM pd p CROSS JOIN tgts t GROUP BY 1, 2
), nt AS (SELECT target, sum(c_t) AS n_t FROM ct GROUP BY 1
), nc AS (SELECT sum(c_c) AS n_c FROM bs
), model AS (
  SELECT ct.target, ct.b,
         ln((CAST(ct.c_t + 1 AS DOUBLE) / (nt.n_t + 1024)) /
            (CAST(bs.c_c + 1 AS DOUBLE) / (nc.n_c + 1024))) AS log_ratio
  FROM ct JOIN bs USING (b) JOIN nt USING (target) CROSS JOIN nc
), w AS (
  SELECT p.doc_id, m.target, CAST(sum(p.c_db) AS BIGINT) AS n_grams,
         round(sum(p.c_db * m.log_ratio), 4) AS log_w
  FROM pd p JOIN model m ON m.b = p.b
  GROUP BY 1, 2
)"""

  private val DSIR_MULTI_W = dsirMultiW(Seq("src0", "src1"))

  /** Composite-PREDICATE DSIR chain (mirror of dsirWeightsMulti with
    * arbitrary Column targets): pd carries (source, lang) and each
    * target's contrast counts sum a SQL predicate — targets need not
    * name one column's values. Ends at `w`. */
  private def dsirCrossW(targets: Seq[(String, String)]) = s"""WITH xtoks AS (
  SELECT doc_id, source, lang,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), occ AS (
  SELECT doc_id, source, lang, unnest(${shinglesN(2)}) AS g FROM xtoks
), pd AS (
  SELECT doc_id, source, lang, ${dh("g")} % 1024 AS b, count(*) AS c_db
  FROM occ GROUP BY 1, 2, 3, 4
), bs AS (SELECT b, sum(c_db) AS c_c FROM pd GROUP BY b
), ct AS (
  ${targets.map { case (n, p) =>
      s"SELECT '$n' AS target, b, sum(CASE WHEN $p THEN c_db ELSE 0 END) AS c_t FROM pd GROUP BY 2" }
    .mkString("\n  UNION ALL ")}
), nt AS (SELECT target, sum(c_t) AS n_t FROM ct GROUP BY 1
), nc AS (SELECT sum(c_c) AS n_c FROM bs
), model AS (
  SELECT ct.target, ct.b,
         ln((CAST(ct.c_t + 1 AS DOUBLE) / (nt.n_t + 1024)) /
            (CAST(bs.c_c + 1 AS DOUBLE) / (nc.n_c + 1024))) AS log_ratio
  FROM ct JOIN bs USING (b) JOIN nt USING (target) CROSS JOIN nc
), w AS (
  SELECT p.doc_id, m.target, CAST(sum(p.c_db) AS BIGINT) AS n_grams,
         round(sum(p.c_db * m.log_ratio), 4) AS log_w
  FROM pd p JOIN model m ON m.b = p.b
  GROUP BY 1, 2
)"""

  private val MINHASH_P = "2305843009213693951"
  private def mhTerm(i: Int): String =
    s"min((h*${2 * i + 1} + ${10007 * i + 1}) % $MINHASH_P) AS mh$i"
  private val SIG = s"""$SH, sig AS (
  SELECT doc_id, ${(0 until 16).map(mhTerm).mkString(", ")} FROM h GROUP BY doc_id)"""

  private def bandSelect(j: Int): String = {
    val cat = (j * 4 until j * 4 + 4).map(i => s"CAST(mh$i AS VARCHAR)").mkString(" || ',' || ")
    s"SELECT doc_id, $j AS band, ${dh(cat)} AS bkey FROM sig"
  }

  /** Mirror of Dedup.simhash's lane-packed form: per-bit ones-counts
    * packed 3-per-long in 20-bit lanes; bit j set iff 2·ones_j > n. */
  private val SIMHASH_FPS = {
    val bits = 32; val laneBits = 20; val lanesPerLong = 3
    val nPacked = (bits + lanesPerLong - 1) / lanesPerLong
    val packed = (0 until nPacked).map { k =>
      val lanes = (0 until lanesPerLong).map(l => (k * lanesPerLong + l, l))
        .filter(_._1 < bits)
        .map { case (j, l) => s"(((h>>$j)&1) << ${l * laneBits})" }
      s"CAST(sum(${lanes.mkString(" + ")}) AS BIGINT) AS p$k"
    }.mkString(", ")
    val mask = (1L << laneBits) - 1
    val fp = (0 until bits).map { j =>
      val ones = s"((p${j / lanesPerLong} >> ${(j % lanesPerLong) * laneBits}) & $mask)"
      s"(CASE WHEN $ones * 2 > n_tok THEN (1::BIGINT << $j) ELSE 0 END)"
    }.mkString(" + ")
    s"""$TOKS, t AS (SELECT doc_id, unnest(tk) AS tok FROM toks
), th AS (SELECT doc_id, ${dh("tok")} AS h FROM t
), v AS (SELECT doc_id, $packed, count(*) AS n_tok FROM th GROUP BY doc_id
), fps AS (SELECT doc_id, $fp AS simhash FROM v)"""
  }

  /** Mirror of m_media_neardup's 64-bit byte-window SimHash
    * (Dedup.simhashOfHashes over sliding 4-byte windows of
    * hex(payload)): same lane packing as [[SIMHASH_FPS]] at 64 bits;
    * bit 63's literal is spelled as BIGINT min because `1::BIGINT <<
    * 63` overflows DuckDB's checked shift, and the `+` chain stays
    * in-range at every partial sum (disjoint bits, ascending, the
    * negative top term last). */
  private val MEDIA_FPS = {
    val bits = 64; val laneBits = 20; val lanesPerLong = 3
    val nPacked = (bits + lanesPerLong - 1) / lanesPerLong
    val packed = (0 until nPacked).map { k =>
      val lanes = (0 until lanesPerLong).map(l => (k * lanesPerLong + l, l))
        .filter(_._1 < bits)
        .map { case (j, l) => s"(((h>>$j)&1) << ${l * laneBits})" }
      s"CAST(sum(${lanes.mkString(" + ")}) AS BIGINT) AS p$k"
    }.mkString(", ")
    val mask = (1L << laneBits) - 1
    val fp = (0 until bits).map { j =>
      val ones = s"((p${j / lanesPerLong} >> ${(j % lanesPerLong) * laneBits}) & $mask)"
      val bit = if (j == 63) "(-9223372036854775807 - 1)::BIGINT" else s"(1::BIGINT << $j)"
      s"(CASE WHEN $ones * 2 > n_tok THEN $bit ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
  FROM documents WHERE octet_length(encode(text)) >= 4
), g AS (
  SELECT doc_id, unnest(list_transform(range(0, n - 3),
    i -> substr(h, CAST(2*i+1 AS INT), 8))) AS gram
  FROM hx
), th AS (SELECT doc_id, ${dh("gram")} AS h FROM g
), v AS (SELECT doc_id, $packed, count(*) AS n_tok FROM th GROUP BY doc_id
), fps AS (SELECT doc_id, $fp AS simhash FROM v)"""
  }

  /** Vector CTEs: double-precision view + norm + nBits-bit sign-LSH
    * bucket (mirror of graft.ext.Similarity). */
  private def vecs(nBits: Int) = {
    val bucket = (0 until nBits).map(i => s"(CASE WHEN v[${i + 1}] > 0 THEN (1::BIGINT << $i) ELSE 0 END)").mkString(" + ")
    s"""WITH vecs AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), nv AS (
  SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm, $bucket AS bucket FROM vecs)"""
  }
  private val VECS = vecs(8)

  /** Gap-sessionization CTEs (mirror of graft.ops.Sessionize.sessions
    * at a 30-minute gap): ends with `sess(user_id, sess_idx,
    * start_us, end_us, duration_us, n_events, n_types, value_fx)`. */
  private val SESSIONS = """WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         CAST(round(value * 1000) AS BIGINT) AS v_fx
  FROM events
), l AS (
  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM ev
), b AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                 THEN 1 ELSE 0 END AS brk
  FROM l
), sx AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess_idx
  FROM b
), sess AS (
  SELECT user_id, sess_idx,
         min(us) AS start_us, max(us) AS end_us,
         CAST(max(us) - min(us) AS BIGINT) AS duration_us,
         count(*) AS n_events,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
         CAST(sum(v_fx) AS BIGINT) AS value_fx
  FROM sx GROUP BY 1, 2)"""

  /** The all-gates curation chain, shared by e_curation_full (the
    * kept corpus) and e_curation_funnel (the per-stage yield counts):
    * intra-doc repeated-span removal (the t_repetition_apply chain,
    * `rt` carries the REBUILT text/tk so the shared QUALITY fragment
    * scores the cleaned form), exact-dedup keepers on the normalized
    * rebuilt text (`kd`), the quality/length gate (`gated`), the
    * per-lang median perplexity gate under the corpus bigram LM
    * (`pplkept` — the e_ppl_filter chain), and the eval holdout
    * (`held`). */
  private lazy val CurationGatesCtes: String = s"""$TOKS, tp AS (
  SELECT doc_id, unnest(range(0, len(tk))) AS pos, tk FROM toks
), tok AS (SELECT doc_id, pos, tk[CAST(pos + 1 AS INT)] AS tok FROM tp
), gp AS (
  SELECT doc_id, unnest(range(0, greatest(len(tk) - 4, 0))) AS p, tk FROM toks
), g AS (
  SELECT doc_id, p,
         array_to_string(tk[CAST(p + 1 AS INT):CAST(p + 5 AS INT)], ' ') AS g
  FROM gp
), firsts AS (SELECT doc_id, g, min(p) AS p0 FROM g GROUP BY 1, 2
), cov0 AS (
  SELECT g.doc_id, unnest(range(g.p, g.p + 5)) AS pos
  FROM g JOIN firsts f ON f.doc_id = g.doc_id AND f.g = g.g
  WHERE g.p > f.p0
), covered AS (SELECT DISTINCT doc_id, pos FROM cov0
), rb AS (
  SELECT t.doc_id, count(*) AS n_kept,
         string_agg(t.tok, ' ' ORDER BY t.pos) AS dedup_text
  FROM tok t LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
  WHERE c.pos IS NULL
  GROUP BY t.doc_id
), rt AS (
  SELECT toks.doc_id,
         CAST(coalesce(rb.n_kept, 0) AS BIGINT) AS n_kept,
         coalesce(rb.dedup_text, '') AS text,
         list_filter(regexp_split_to_array(lower(trim(coalesce(rb.dedup_text, ''))), '\\s+'),
                     t -> len(t) > 0) AS tk
  FROM toks LEFT JOIN rb ON rb.doc_id = toks.doc_id
), norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS ntext FROM rt
), grp AS (
  SELECT ${dh("ntext")} AS th, CAST(length(ntext) AS BIGINT) AS tl, min(doc_id) AS keeper
  FROM norm GROUP BY 1, 2
), kd AS (
  SELECT rt.* FROM rt JOIN grp ON rt.doc_id = grp.keeper
), gated AS (
  SELECT kd.doc_id, d.lang, round($QUALITY, 4) AS quality, kd.n_kept
  FROM kd JOIN (SELECT doc_id, lang FROM documents) d ON d.doc_id = kd.doc_id
  WHERE round($QUALITY, 4) >= 0.5 AND kd.n_kept BETWEEN 10 AND 200
), occ AS (
  SELECT doc_id, unnest(${shinglesN(2)}) AS s FROM toks
), c2 AS (SELECT s, count(*) AS c2 FROM occ GROUP BY s
), c1 AS (SELECT string_split(s, ' ')[1] AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1
), v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(tk) AS t FROM toks)
), model AS (
  SELECT c2.s, ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v)) AS logp
  FROM c2 JOIN c1 ON string_split(c2.s, ' ')[1] = c1.w1 CROSS JOIN v
), x AS (
  SELECT occ.doc_id, round(-sum(m.logp) / count(*), 4) AS xent
  FROM occ JOIN model m USING (s) GROUP BY occ.doc_id
), cut AS (
  SELECT d.lang, quantile_cont(x.xent, 0.5) AS cutoff
  FROM x JOIN documents d USING (doc_id) GROUP BY d.lang
), pplkept AS (
  SELECT gt.doc_id, gt.lang, gt.quality, gt.n_kept, x.xent AS xent_nats
  FROM gated gt JOIN x ON x.doc_id = gt.doc_id JOIN cut ON cut.lang = gt.lang
  WHERE x.xent <= cut.cutoff
), held AS (
  SELECT * FROM pplkept
  WHERE NOT (${dh("lang || '|' || CAST(doc_id AS VARCHAR)")} % 100 < 20))"""

  /** Sketch-free GROUP BY + HAVING replay of the exact heavy hitters
    * — shared by t_heavy_hitters (DSL two-phase Misra–Gries) and
    * q_sql_heavy (the registered-aggregate one-statement twin): the
    * integer threshold makes both forms reduce to this exact set no
    * matter which valid candidate superset the sketch retained. */
  private val HeavyHittersSql = s"""$TOKS, occ AS (
  SELECT unnest(${shinglesN(2)}) AS s FROM toks
), n AS (SELECT count(*) AS n FROM occ)
SELECT s AS gram, CAST(count(*) AS BIGINT) AS cnt
FROM occ CROSS JOIN n
GROUP BY s, n.n
HAVING count(*) * 1025 > n.n"""

  /** row_number replay of the KMV daily-distinct estimator — the
    * deterministic value-set form (k smallest distinct hashes per
    * day), shared by a_daily_distinct_kmv (DSL aggregate) and
    * q_sql_kmv (the registered-aggregate spark.sql twin). */
  private val KmvDailySql = s"""WITH ev AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
         ${dh("CAST(user_id AS VARCHAR)")} AS h
  FROM events
), r AS (
  SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM ev
), sk AS (
  SELECT day, count(*) AS n_in_sketch,
         max(CASE WHEN rn = 16 THEN h END) AS h_k
  FROM r WHERE rn <= 16 GROUP BY day)
SELECT day,
       CASE WHEN n_in_sketch < 16 THEN n_in_sketch
            ELSE CAST(round(15.0 * 72057594037927936 / h_k) AS BIGINT) END
         AS est_distinct
FROM sk"""

  /** DuckDB-native ASOF JOIN replay of the as-of operator — an
    * INDEPENDENT algorithm from the engine's union+running-window
    * rewrite; shared verbatim by a_asof_join (DSL) and q_sql_asof
    * (the spark.sql twin). */
  private val AsOfJoinSql = """WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_event_id, user_id, CAST(ts AS TIMESTAMP) AS c_ts
  FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       c.click_event_id, epoch_us(c.c_ts) AS click_ts_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.c_ts <= p.ts"""

  /** Naive inequality-join replay of the interval-overlap operator —
    * shared verbatim by a_interval_join (DSL) and q_sql_interval (the
    * spark.sql twin): both engine forms must reduce to this exact
    * pair set, which is what pins the bucketed rewrite's exactly-once
    * algebra from two independent entry points. */
  private val IntervalJoinSql = s"""$SESSIONS, err AS (
  SELECT us // 86400000000 AS err_day,
         min(us) AS err_start_us, max(us) AS err_end_us
  FROM ev WHERE event_type = 'error' GROUP BY 1)
SELECT s.user_id, CAST(s.sess_idx AS BIGINT) AS sess_idx, e.err_day,
       least(s.end_us, e.err_end_us) - greatest(s.start_us, e.err_start_us)
         AS overlap_us
FROM sess s JOIN err e
  ON s.start_us <= e.err_end_us AND e.err_start_us <= s.end_us"""

  /** Per-group OLS trend from exact integer moments — shared by the
    * from-scratch a_trend row AND the partials-merged
    * a_trend_incremental row (same output contract, independent
    * derivations on the engine side). */
  private val TREND_SQL = """WITH ev AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(round(value * 10000) AS BIGINT) AS yfx
  FROM events
), mn AS (SELECT event_type, min(day) AS day0 FROM ev GROUP BY 1
), x AS (
  SELECT ev.event_type, ev.day - mn.day0 AS x, yfx
  FROM ev JOIN mn USING (event_type)
), m AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yfx) AS BIGINT) AS sy,
         CAST(sum(x * yfx) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM x GROUP BY 1)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / 10000.0, 4)
         AS slope_per_day,
       round((CAST(sy AS DOUBLE) -
              (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
              (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx) / n / 10000.0, 4)
         AS intercept
FROM m"""

  /** Ridge normal-equation recursive iterate (mirror of
    * graft.ext.Ridge.jacobiSweeps): exact fixed-point moments
    * G = XᵀX (scale 1e3 → 1e6 units) and b = Xᵀy (1e3 units), then 60
    * damped-Jacobi sweeps on A = G + 50·I with ω = 1/max_i(Σ|A_ij|/A_ii).
    * Update associativity `w + (ω·(b − aw)) / d` mirrors the engine
    * verbatim. Ends with `it(t, w)`; read `WHERE t = 60`. */
  private val RIDGE_IT = """WITH RECURSIVE amat AS (
  WITH vecs AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                       CAST(label AS DOUBLE) AS y FROM embeddings),
  idx AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS i),
  pr AS (SELECT a.i AS i, b.i AS j FROM idx a, idx b)
  SELECT pr.i, pr.j,
         CAST(sum(CAST(round(v[pr.i+1]*1000.0) AS BIGINT) *
                  CAST(round(v[pr.j+1]*1000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
         + CASE WHEN pr.i = pr.j THEN 50.0 ELSE 0.0 END AS a
  FROM vecs CROSS JOIN pr GROUP BY 1, 2
), bvec AS (
  SELECT i.i AS i,
         CAST(sum(CAST(round(v[i.i+1]*y*1000.0) AS BIGINT)) AS DOUBLE) / 1000.0 AS b
  FROM (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               CAST(label AS DOUBLE) AS y FROM embeddings)
  CROSS JOIN (SELECT CAST(unnest(range(0, 64)) AS INT) AS i) i
  GROUP BY 1
), dg AS (SELECT i, a AS d FROM amat WHERE i = j
), om AS (
  SELECT 1.0 / max(rs / d) AS omega FROM (
    SELECT i, sum(abs(a)) AS rs, max(CASE WHEN i = j THEN a END) AS d
    FROM amat GROUP BY i)
), it AS (
  SELECT 0 AS t, list_transform(range(0, 64), x -> CAST(0.0 AS DOUBLE)) AS w
  UNION ALL
  SELECT t+1, (
    SELECT list(it.w[i+1] + omega * (b - aw) / d ORDER BY i) FROM (
      SELECT m.i AS i, sum(m.a * it.w[m.j+1]) AS aw FROM amat m GROUP BY m.i) s
    JOIN dg USING (i) JOIN bvec USING (i) CROSS JOIN om)
  FROM it WHERE t < 60
)"""

  /** Morton bit-spread (mirror of graft.ops.Layout.spread16): scatter
    * the low 16 bits of `e` onto even positions with the classic
    * shift-and-mask chain. Inlined (each level duplicates the lower
    * level), so `e` should be a bare column reference. */
  private def zspread(e: String): String = {
    val m0 = s"(($e) & 65535)"
    val m1 = s"(($m0 | ($m0 << 8)) & 16711935)"
    val m2 = s"(($m1 | ($m1 << 4)) & 252645135)"
    val m3 = s"(($m2 | ($m2 << 2)) & 858993459)"
    s"(($m3 | ($m3 << 1)) & 1431655765)"
  }

  /** Morton z value of two 16-bit dims (mirror of Layout.zValue). */
  private def zmorton(a: String, b: String): String =
    s"(${zspread(a)} | (${zspread(b)} << 1))"

  /** LSH-verified Jaccard pair CTEs (mirror of Dedup.lshVerifiedJaccard):
    * ends with `pairs(doc_a, doc_b, jaccard)` at threshold 0.5. */
  private val LSH_CANDS = s"""$SIG, bands AS (
  ${(0 until 4).map(bandSelect).mkString("\n  UNION ALL ")}),
cands AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)"""

  private val LSH_PAIRS = s"""$LSH_CANDS,
sz AS (SELECT doc_id, count(*) AS n_sh FROM h GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cands c
  JOIN h a ON a.doc_id = c.doc_a
  JOIN h b ON b.doc_id = c.doc_b AND b.h = a.h
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b,
         round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5)"""

  /** Incremental batch-vs-corpus near-dup CTEs (mirror of
    * Dedup.incrementalNearDups with batch = doc_id%10==0): ends with
    * `ipairs(batch_doc, corpus_doc, jaccard)` at threshold 0.5. */
  private val INCR_PAIRS = s"""$SIG, bands AS (
  ${(0 until 4).map(bandSelect).mkString("\n  UNION ALL ")}),
cands AS (
  SELECT DISTINCT x.doc_id AS batch_doc, y.doc_id AS corpus_doc
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bkey = y.bkey
   AND x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0),
sz AS (SELECT doc_id, count(*) AS n_sh FROM h GROUP BY doc_id),
inter AS (
  SELECT c.batch_doc, c.corpus_doc, count(*) AS n_inter
  FROM cands c
  JOIN h a ON a.doc_id = c.batch_doc
  JOIN h b ON b.doc_id = c.corpus_doc AND b.h = a.h
  GROUP BY 1, 2),
ipairs AS (
  SELECT batch_doc, corpus_doc,
         round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
  FROM inter JOIN sz sa ON sa.doc_id = batch_doc JOIN sz sb ON sb.doc_id = corpus_doc
  WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5)"""

  /** PQ encode/reconstruct/score CTEs (mirror of Similarity.pqTopK at
    * m=8, sub=8, queries vec_id < 8, `kCodes` codewords per subspace):
    * `s` holds the approximate (reconstruction-domain) cosine per
    * (q_id, vec_id). */
  private def pqScores(kCodes: Int) = s"""$VECS, seeds0 AS (
  SELECT vec_id AS c_id, v FROM nv
  ORDER BY ${dh("CAST(vec_id AS VARCHAR)")}, vec_id LIMIT $kCodes
), seeds AS (
  SELECT c_id, v, row_number() OVER (ORDER BY c_id) AS code FROM seeds0
), subcw AS (
  SELECT t.i AS sub, code, v[t.i*8+1 : t.i*8+8] AS cw FROM seeds, range(0, 8) t(i)
), enc AS (
  SELECT nv.vec_id, sc.sub, sc.code,
         list_sum(list_transform(range(1, 9),
           j -> (nv.v[sc.sub*8 + j] - sc.cw[j]) * (nv.v[sc.sub*8 + j] - sc.cw[j]))) AS d
  FROM nv, subcw sc
), best AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) AS rn
    FROM enc) WHERE rn = 1
), recon AS (
  SELECT b.vec_id, flatten(list(sc.cw ORDER BY b.sub)) AS recon
  FROM best b JOIN subcw sc ON sc.sub = b.sub AND sc.code = b.code
  GROUP BY b.vec_id
), r AS (
  SELECT recon.vec_id, recon.recon, sqrt(list_dot_product(recon.recon, recon.recon)) AS rnorm
  FROM recon WHERE vec_id >= 8
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nv WHERE vec_id < 8
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, recon) / (qn * rnorm) AS cos FROM q, r)"""

  private val PQ_SCORES = pqScores(4)

  /** IVFPQ chain at a given PQ codebook size: IVF cell restriction
    * (IVF_ASG) + PQ encode/recon scoring — the two independently
    * mirrored chains composed; kCodes parameterizes the seeds LIMIT
    * exactly like [[pqScores]]. */
  private def ivfPqSql(kCodes: Int) = s"""$IVF_ASG, seeds0 AS (
  SELECT vec_id AS c_id, v FROM nv
  ORDER BY ${dh("CAST(vec_id AS VARCHAR)")}, vec_id LIMIT $kCodes
), seeds AS (
  SELECT c_id, v, row_number() OVER (ORDER BY c_id) AS code FROM seeds0
), subcw AS (
  SELECT t.i AS sub, code, v[t.i*8+1 : t.i*8+8] AS cw FROM seeds, range(0, 8) t(i)
), enc AS (
  SELECT nv.vec_id, sc.sub, sc.code,
         list_sum(list_transform(range(1, 9),
           j -> (nv.v[sc.sub*8 + j] - sc.cw[j]) * (nv.v[sc.sub*8 + j] - sc.cw[j]))) AS d
  FROM nv, subcw sc
), best AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) AS rn
    FROM enc) WHERE rn = 1
), recon AS (
  SELECT b.vec_id, flatten(list(sc.cw ORDER BY b.sub)) AS recon
  FROM best b JOIN subcw sc ON sc.sub = b.sub AND sc.code = b.code
  GROUP BY b.vec_id
), r AS (
  SELECT a.vec_id, a.cell, rc.recon,
         sqrt(list_dot_product(rc.recon, rc.recon)) AS rnorm
  FROM recon rc JOIN asg a ON a.vec_id = rc.vec_id
  WHERE a.vec_id >= 8
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell AS q_cell FROM asg WHERE vec_id < 8
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, recon) / (qn * rnorm) AS cos
  FROM q JOIN r ON q_cell = cell)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3"""

  /** IVF codebook + assignment CTEs (mirror of Similarity.ivfAssign):
    * codebook = the 8 vectors with the smallest portable hash of
    * vec_id (ties by vec_id) — fixed k, independent of corpus size;
    * every vector assigned to its argmax-cosine cell (ties by smaller
    * c_id, same rule as the engine's ordered fold). */
  private val IVF_ASG = s"""$VECS, cents AS (
  SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM nv
  ORDER BY ${dh("CAST(vec_id AS VARCHAR)")}, vec_id LIMIT 8
), asg AS (
  SELECT vec_id, v, nrm, c_id AS cell FROM (
    SELECT nv.vec_id, nv.v, nv.nrm, c.c_id,
           row_number() OVER (PARTITION BY nv.vec_id
             ORDER BY list_dot_product(nv.v, c.cv) / (nv.nrm * c.cn) DESC, c.c_id) AS crnk
    FROM nv, cents c) WHERE crnk = 1
)"""

  /** One spherical-k-means mean step over an assignment CTE (mirror of
    * Similarity.kmeansCodebook): per-dimension means in 1e6 fixed
    * point — exact BIGINT sums, then the same double division
    * sequence as the engine, so the codebook is bit-identical. */
  private def kmMeans(asg: String): String = {
    val exprs = (1 to 64).map(i =>
      s"(CAST(sum(CAST(round(v[$i]*1000000.0) AS BIGINT)) AS DOUBLE)/1000000.0)/count(*)")
      .mkString(",\n    ")
    s"SELECT cell AS c_id, [$exprs] AS cv FROM $asg GROUP BY cell"
  }

  /** argmax-cosine assignment against a codebook CTE (same tie rule as
    * the engine's ordered fold: cos desc, c_id asc). */
  private def kmAssign(cents: String): String =
    s"""SELECT vec_id, v, nrm, c_id AS cell FROM (
    SELECT nv.vec_id, nv.v, nv.nrm, c.c_id,
           row_number() OVER (PARTITION BY nv.vec_id
             ORDER BY list_dot_product(nv.v, c.cv) / (nv.nrm * c.cn) DESC, c.c_id) AS crnk
    FROM nv, $cents c) WHERE crnk = 1"""

  /** Exact fixed-point per-label centroid as a 64-element list — the
    * SQL mirror of Similarity.labelCentroids' VectorSumFixed means
    * (micro-unit longs, order-independent), shared by the centroid
    * consumers. Expects a `v` DOUBLE-list column in scope. */
  private val CENT_ARR: String =
    s"""[${(1 to 64).map(i =>
      s"(CAST(sum(CAST(round(v[$i]*1000000.0) AS BIGINT)) AS DOUBLE)/1000000.0)/count(*)")
      .mkString(",\n   ")}]"""

  /** DSIR weight CTE chain (mirror of TextOps.dsirWeights toward
    * src0, 1024 buckets) ending in `w(doc_id, n_grams, log_w)` —
    * shared by the weights query and the resample apply. */
  private val DSIR_W = s"""WITH toks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), occ AS (
  SELECT doc_id, source = 'src0' AS is_t, unnest(${shinglesN(2)}) AS g FROM toks
), pd AS (
  SELECT doc_id, is_t, ${dh("g")} % 1024 AS b, count(*) AS c_db
  FROM occ GROUP BY 1, 2, 3
), tgt AS (SELECT b, sum(c_db) AS c_t FROM pd WHERE is_t GROUP BY b),
cor AS (SELECT b, sum(c_db) AS c_c FROM pd GROUP BY b),
nt AS (SELECT sum(c_t) AS n_t FROM tgt),
nc AS (SELECT sum(c_c) AS n_c FROM cor),
model AS (
  SELECT b, ln((CAST(coalesce(c_t, 0) + 1 AS DOUBLE) / (n_t + 1024)) /
               (CAST(c_c + 1 AS DOUBLE) / (n_c + 1024))) AS log_ratio
  FROM cor LEFT JOIN tgt USING (b) CROSS JOIN nt CROSS JOIN nc),
w AS (
  SELECT doc_id, CAST(sum(c_db) AS BIGINT) AS n_grams,
         round(sum(c_db * log_ratio), 4) AS log_w
  FROM pd JOIN model USING (b) GROUP BY doc_id)"""

  /** Winnowing fingerprint CTEs (mirror of TextOps.winnow at n=3,
    * w=4) ending in `wfps(doc_id, pos, fp)` — shared by the index
    * query and the pair consumer. */
  private val WINNOW = s"""WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), hsx AS (
  SELECT doc_id, list_transform(${shinglesN(3)}, s -> ${dh("s")}) AS hs FROM toks
  WHERE len(tk) >= 3
), win AS (
  SELECT doc_id, unnest(range(1, len(hs) - 4 + 2)) AS i, hs
  FROM hsx WHERE len(hs) >= 4
), sel AS (
  SELECT doc_id,
         i + 4 - list_indexof(list_reverse(hs[i:i+3]), list_min(hs[i:i+3])) AS pos,
         list_min(hs[i:i+3]) AS fp
  FROM win),
wfps AS (SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, fp FROM sel)"""

  /** Exact brute-force cosine top-5 SQL (shared by s_ann_brute and
    * the s_ann_recall_audit composition). */
  private val S_ANN_BRUTE: String = s"""$VECS, q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nv WHERE vec_id < 8
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN nv ON vec_id >= 8)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 5"""

  /** Binary sign-code ANN SQL (shared by s_ann_hamming and the
    * s_ann_recall_audit composition). */
  /** DCT perceptual-hash CTE chain (mirror of
    * Multimodal.dctFingerprints): the 8×8 sampled grid, two integer
    * matrix multiplies against the SAME e6 basis literals the engine
    * compiled in, med2 threshold over the 63 AC coefficients. Ends at
    * `fp(doc_id, h)`. */
  private val DCT_FP: String = {
    val a = graft.ext.Multimodal.DctBasisE6.mkString("[", ", ", "]")
    s"""WITH px AS (
  SELECT doc_id,
         list_transform(range(0, 64), i ->
           CAST(ascii(substr(text,
             CAST(1 + (i * length(text)) // 64 AS INT), 1)) AS BIGINT)) AS p
  FROM documents WHERE length(text) >= 1
), y AS (
  SELECT doc_id,
         list_transform(range(0, 64), t ->
           list_aggregate(list_transform(range(0, 8), k ->
             ($a)[CAST((t // 8) * 8 + k + 1 AS INT)] *
             p[CAST(k * 8 + t % 8 + 1 AS INT)]), 'sum')) AS y
  FROM px
), c AS (
  SELECT doc_id,
         (list_transform(range(0, 64), t ->
           list_aggregate(list_transform(range(0, 8), j ->
             ($a)[CAST((t % 8) * 8 + j + 1 AS INT)] *
             y[CAST((t // 8) * 8 + j + 1 AS INT)]), 'sum')))[2:64] AS ac
  FROM y
), m AS (
  SELECT doc_id, ac, list_sort(ac)[32] * 2 AS med2 FROM c
), fp AS (
  SELECT doc_id, CAST(list_aggregate(list_transform(range(0, 63), i ->
    CASE WHEN ac[CAST(i + 1 AS INT)] * 2 > med2
         THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
         ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT) AS h
  FROM m
)"""
  }

  /** Shared Hamming-ANN SQL builder: `words` renders each code word,
    * `nCand` is the rerank budget — the 64-bit registry dial and the
    * 128-bit graduated one differ only here. */
  private def annHammingSql(words: Seq[String], nCand: Int): String = {
    val names = words.indices.map(i => s"c$i")
    val defs = words.zip(names).map { case (w, n) => s"$w AS $n" }.mkString(",\n         ")
    val qsel = names.map(n => s"$n AS q$n").mkString(", ")
    val hd = names.map(n => s"bit_count(xor(q$n, $n))").mkString(" + ")
    s"""WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), nv AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         $defs
  FROM vecs
), q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, $qsel
         FROM nv WHERE vec_id < 8
), st AS (SELECT * FROM nv WHERE vec_id >= 8
), cand AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY hd, vec_id) AS hrnk
  FROM (SELECT q_id, vec_id, $hd AS hd
        FROM q JOIN st ON q_id <> vec_id)
), rr AS (
  SELECT c.q_id, c.vec_id,
         list_dot_product(q.qv, s.v) / (q.qn * s.nrm) AS cos
  FROM cand c JOIN st s USING (vec_id) JOIN q ON c.q_id = q.q_id
  WHERE c.hrnk <= $nCand)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos
FROM (SELECT q_id, vec_id, cos,
        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
      FROM rr)
WHERE rnk <= 5"""
  }

  /** Sign word w (mirror of Similarity.binaryCodeWord). */
  private def signWord(w: Int): String = (0 until 32).map(i =>
    s"(CASE WHEN v[${w * 32 + i + 1}] > 0 THEN (1::BIGINT << $i) ELSE 0 END)")
    .mkString(" + ")

  /** Difference-sign word w at offset `off` (mirror of
    * Similarity.diffCodeWord). */
  private def diffWord(w: Int, off: Int): String = (0 until 32).map { i =>
    val d = w * 32 + i
    s"(CASE WHEN v[${d + 1}] > v[${(d + off) % 64 + 1}] THEN (1::BIGINT << $i) ELSE 0 END)"
  }.mkString(" + ")

  private val S_ANN_HAMMING: String =
    annHammingSql(Seq(signWord(0), signWord(1)), 32)

  /** The graduated 128-bit dial (sign + offset-7 difference-sign
    * words, 64-candidate rerank — Similarity.hammingTopKWide). */
  private val S_ANN_HAMMING128: String =
    annHammingSql(Seq(signWord(0), signWord(1), diffWord(0, 7), diffWord(1, 7)), 64)

  /** s_ann_lsh_mp4 SQL (shared with the s_ann_recall_audit composition). */
  private val S_ANN_LSH_MP4: String = s"""${vecs(4)}, q0 AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket FROM nv WHERE vec_id < 8
), probes AS (
  SELECT q_id, qv, qn, bucket AS q_bucket FROM q0
  UNION ALL
  SELECT q_id, qv, qn, xor(bucket, CAST(1 AS BIGINT) << i) FROM q0, range(0, 4) t(i)
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM probes JOIN nv ON q_bucket = bucket AND vec_id >= 8)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3"""

  /** s_ann_ivf_mp4 SQL (shared with the s_ann_recall_audit composition). */
  private val S_ANN_IVF_MP4: String = s"""$IVF_ASG, q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id AS q_cell FROM (
    SELECT nv.vec_id, nv.v, nv.nrm, c.c_id,
           row_number() OVER (PARTITION BY nv.vec_id
             ORDER BY list_dot_product(nv.v, c.cv) / (nv.nrm * c.cn) DESC, c.c_id) AS crnk
    FROM nv, cents c WHERE nv.vec_id < 8) WHERE crnk <= 4
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN asg ON q_cell = cell AND vec_id >= 8)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3"""

  /** s_ann_pq_rerank64 SQL (shared with the s_ann_recall_audit composition). */
  private val S_ANN_PQ_RERANK64: String = s"""${pqScores(64)}, short AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
    FROM s) WHERE rn <= 50
), ex AS (
  SELECT sh.q_id, sh.vec_id,
         list_dot_product(q.qv, nv.v) / (q.qn * nv.nrm) AS cos
  FROM short sh JOIN q ON q.q_id = sh.q_id JOIN nv ON nv.vec_id = sh.vec_id)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM ex)
WHERE rnk <= 3"""

  /** s_ann_sq8 SQL (shared with the s_ann_recall_audit composition). */
  private val S_ANN_SQ8: String = s"""$VECS, sq AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM vecs
), dq AS (
  SELECT vec_id,
         CASE WHEN mx <> 0
              THEN list_transform(v, x -> round(x * 127.0 / mx) * mx / 127.0)
              ELSE list_transform(v, x -> 0.0) END AS v
  FROM sq
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nv WHERE vec_id < 8
), s AS (
  SELECT q_id, d.vec_id,
         list_dot_product(qv, d.v) / (qn * sqrt(list_dot_product(d.v, d.v))) AS cos
  FROM q JOIN dq d ON d.vec_id >= 8)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3"""

  /** Kneser-Ney bigram probability CTE chain (ends in kn_bi(w1, w2,
    * c12, p_kn_e6)) - shared by t_bigram_kn and the interpolated
    * trigram model. */
  private val KN_BI = s"""$TOKS, occ AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk)-1, 0)+1),
    i -> array_to_string(tk[i:i+1], ' '))) AS s
  FROM toks
), c AS (
  SELECT split_part(s, ' ', 1) AS w1, split_part(s, ' ', 2) AS w2,
         count(*) AS c12
  FROM occ GROUP BY 1, 2
), b1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1f
          FROM c GROUP BY 1
), b2 AS (SELECT w2, count(*) AS n1p FROM c GROUP BY 1
), nb AS (SELECT count(*) AS nbt FROM c
), kn_bi AS (
  SELECT w1, w2, c12,
         greatest(4 * c12 - 3, 0) * 1000000 // (4 * c1) +
         3 * n1f * n1p * 1000000 // (4 * c1 * nbt) AS p_kn_e6
  FROM c JOIN b1 USING (w1) JOIN b2 USING (w2) CROSS JOIN nb)"""

  val all: Map[String, String] = Map(
    // injected-SQL-surface twin: the Spark side runs through spark.sql
    // with GraftExtensions-registered expressions; the be_int round
    // trip is the identity, and the logit/norm ride the e3
    // floor-quantized embedding (integer-valued doubles — exact)
    "q_sql_surface" -> s"""SELECT vec_id,
  CAST(vec_id AS BIGINT) AS rt_id,
  CAST(list_dot_product(
    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000.0 + 0.5)),
    [${graft.SparkEntry.ModelWeightsX10.mkString(", ")}]) AS BIGINT) + 1000 AS logit_fx,
  CAST(list_dot_product(
    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000.0 + 0.5)),
    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000.0 + 0.5)))
    AS BIGINT) AS norm2_fx
FROM embeddings""",
    // the SQL-only parity chain: identical rows to q_log_correlation
    // (the Spark side's be_int decode is a big-endian round trip over
    // int-range values — the identity, like q_sql_surface's rt_id)
    "q_sql_pipeline" -> """WITH rec AS (
  SELECT event_id, CAST(floor(value) AS BIGINT) AS value_int,
         substr(md5(CAST(event_id AS VARCHAR)), 1, 16) AS trace_id
  FROM events
), ctx AS (
  SELECT *, 'messageid_' || CAST(value_int AS VARCHAR) AS messageid FROM rec
), evens AS (SELECT * FROM ctx WHERE value_int % 2 = 0
), odds AS (SELECT * FROM ctx WHERE value_int % 2 <> 0 OR value_int IS NULL
), logs AS (
  SELECT trace_id, 'Got number: ' || CAST(value_int AS VARCHAR) AS line FROM ctx
  UNION ALL SELECT trace_id, 'Even number: ' || CAST(value_int AS VARCHAR) FROM evens
  UNION ALL SELECT CAST(NULL AS VARCHAR), 'Odd number: ' || CAST(value_int AS VARCHAR) FROM odds)
SELECT e.event_id, e.trace_id, e.messageid, l.line
FROM evens e JOIN logs l ON e.trace_id = l.trace_id""",

    "q_branch_even" -> s"$REC SELECT event_id, user_id, value_int FROM evens",

    "q_branch_odd" -> s"$REC SELECT event_id, user_id, value_int FROM odds",

    "q_derive_context" ->
      s"$REC SELECT event_id, trace_id, span_id, parent_id, messageid FROM rec",

    "q_b3_roundtrip" -> s"""$REC, b AS (
  SELECT event_id, trace_id || '-' || span_id || '-1' AS b3 FROM rec)
SELECT event_id, b3,
       split_part(b3, '-', 1) AS p_trace_id,
       split_part(b3, '-', 2) AS p_span_id,
       split_part(b3, '-', 3) = '1' AS p_sampled
FROM b""",

    "q_header_lookup" -> s"""$REC, h AS (
  SELECT event_id, [
    {'key': 'b3', 'value': trace_id || '-' || parent_id || '-1'},
    {'key': 'messageid', 'value': messageid},
    {'key': 'b3', 'value': trace_id || '-' || span_id || '-1'}] AS headers
  FROM rec)
SELECT event_id,
       list_filter(headers, x -> x.key = 'b3')[-1].value AS b3_hdr,
       list_filter(headers, x -> x.key = 'messageid')[-1].value AS messageid_hdr,
       list_filter(headers, x -> x.key = 'nope')[-1].value AS missing_hdr
FROM h""",

    "q_first_match" -> s"""$REC SELECT user_id, event_id, value_int, epoch_us(ts) AS ts_us FROM (
  SELECT user_id, event_id, value_int, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM evens) WHERE rn = 1""",

    "q_log_correlation" -> s"""$REC, logs AS (
  SELECT trace_id, 'Got number: ' || CAST(value_int AS VARCHAR) AS line FROM rec
  UNION ALL SELECT trace_id, 'Even number: ' || CAST(value_int AS VARCHAR) FROM evens
  UNION ALL SELECT CAST(NULL AS VARCHAR), 'Odd number: ' || CAST(value_int AS VARCHAR) FROM odds)
SELECT e.event_id, e.trace_id, e.messageid, l.line
FROM evens e JOIN logs l ON e.trace_id = l.trace_id""",

    "q_span_enrich" -> s"""$REC, spans AS (
  SELECT trace_id, substr(md5(trace_id || '-set'), 1, 16) AS span_id, 'set' AS name,
         CAST(NULL AS VARCHAR) AS rsn, CAST(NULL AS VARCHAR) AS topic FROM rec
  UNION ALL SELECT trace_id, substr(md5(trace_id || '-send-even'), 1, 16), 'send-even', 'kafka', 'even-numbers' FROM evens
  UNION ALL SELECT trace_id, substr(md5(trace_id || '-send-odd'), 1, 16), 'send-odd', 'kafka', 'odd-numbers' FROM odds)
SELECT trace_id, span_id, name,
       CASE WHEN topic IS NOT NULL THEN rsn || '/' || topic ELSE rsn END AS remote_service_name
FROM spans""",

    "q_dependency_graph" -> s"""$REC
SELECT 'graft-app' AS local_service, 'kafka/' || t AS remote_service_name, count(*) AS n_calls
FROM (SELECT CASE WHEN value_int % 2 = 0 THEN 'even-numbers' ELSE 'odd-numbers' END AS t FROM rec)
GROUP BY 1, 2""",

    "q_trace_assembly" -> """WITH byuser AS (
  SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 16) AS trace_id,
         CASE WHEN CAST(floor(value) AS BIGINT) % 2 = 0 THEN 'send-even' ELSE 'send-odd' END AS name,
         CAST(ts AS TIMESTAMP) AS ts
  FROM events)
SELECT trace_id, count(*) AS n_spans,
       string_agg(name, ',' ORDER BY name) AS span_names,
       epoch_us(min(ts)) AS trace_start_us, epoch_us(max(ts)) AS trace_end_us
FROM byuser GROUP BY trace_id""",

    // critical path over the modeled 3-level span tree (root 1000 us →
    // per-event app hop → kafka send leaf): the oracle computes the
    // CLOSED FORM of the max root-to-leaf path on that tree —
    // independent of the engine's bottom-up DP, which must agree
    "q_critical_path" -> """WITH ev AS (
  SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 16) AS trace_id,
         CAST(floor(value) AS BIGINT) AS value_int
  FROM events)
SELECT trace_id, CAST(1 + 2 * count(*) AS BIGINT) AS n_spans,
       CAST(1000 + max(value_int * 10 + 100 + (value_int % 7) * 25 + 50) AS BIGINT)
         AS critical_path_us
FROM ev GROUP BY trace_id""",

    // critical-path decomposition: the modeled tree's closed form -- the
    // best event per trace is argmax by (hop+send path, minted hop span
    // id), matching the engine's max(struct(path_us, span_id)) argmax;
    // the waterfall is then root -> that event's app hop -> its send
    "q_critical_hops" -> """WITH ev AS (
  SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 16) AS trace_id,
         CAST(event_id AS VARCHAR) AS eid,
         CAST(floor(value) AS BIGINT) AS v
  FROM events
), scored AS (
  SELECT trace_id, eid, v,
         v * 10 + 100 + (v % 7) * 25 + 50 AS hop_path,
         substr(md5(trace_id || '-' || eid), 1, 16) AS hop_span
  FROM ev
), best AS (
  SELECT trace_id, eid, v, hop_span FROM (
    SELECT *, row_number() OVER (PARTITION BY trace_id
                ORDER BY hop_path DESC, hop_span DESC) AS rk
    FROM scored) WHERE rk = 1)
SELECT trace_id, CAST(0 AS INT) AS hop,
       substr(md5(trace_id || '-root'), 1, 16) AS span_id,
       'gateway' AS service, CAST(1000 AS BIGINT) AS duration_us
FROM best
UNION ALL
SELECT trace_id, CAST(1 AS INT), hop_span, 'graft-app',
       CAST(v * 10 + 100 AS BIGINT)
FROM best
UNION ALL
SELECT trace_id, CAST(2 AS INT),
       substr(md5(trace_id || '-' || eid || '/send'), 1, 16),
       'kafka/' || CASE WHEN v % 2 = 0 THEN 'even-numbers'
                        ELSE 'odd-numbers' END,
       CAST((v % 7) * 25 + 50 AS BIGINT)
FROM best""",

    // root-cause attribution: for each slow trace (q_trace_anomaly's
    // closed form), the critical-path hop with max excess over its
    // (n_spans, hop) class mean; the argmax key is the INTEGER-scaled
    // excess duration*class_n - class_sum (ties -> hop desc, span desc),
    // exactly the engine's max(struct(...)) ordering, and excess_us is
    // the same two IEEE ops on exact integers in both engines
    "q_critical_blame" -> """WITH ev AS (
  SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 16) AS trace_id,
         CAST(event_id AS VARCHAR) AS eid,
         CAST(floor(value) AS BIGINT) AS v
  FROM events
), scored AS (
  SELECT trace_id, eid, v,
         v * 10 + 100 + (v % 7) * 25 + 50 AS hop_path,
         substr(md5(trace_id || '-' || eid), 1, 16) AS hop_span
  FROM ev
), best AS (
  SELECT trace_id, eid, v, hop_span FROM (
    SELECT *, row_number() OVER (PARTITION BY trace_id
                ORDER BY hop_path DESC, hop_span DESC) AS rk
    FROM scored) WHERE rk = 1
), cp AS (
  SELECT trace_id, CAST(1 + 2 * count(*) AS BIGINT) AS n_spans,
         CAST(1000 + max(v * 10 + 100 + (v % 7) * 25 + 50) AS BIGINT) AS cp_us
  FROM ev GROUP BY trace_id
), st AS (
  SELECT n_spans AS ns, avg(cp_us) + 2 * stddev(cp_us) AS thr
  FROM cp GROUP BY 1
), slow AS (
  SELECT trace_id FROM cp JOIN st ON n_spans = ns
  WHERE thr IS NOT NULL AND cp_us > thr
), hops AS (
  SELECT trace_id, 0 AS hop,
         substr(md5(trace_id || '-root'), 1, 16) AS span_id,
         'gateway' AS service, CAST(1000 AS BIGINT) AS duration_us
  FROM best
  UNION ALL
  SELECT trace_id, 1, hop_span, 'graft-app', CAST(v * 10 + 100 AS BIGINT)
  FROM best
  UNION ALL
  SELECT trace_id, 2,
         substr(md5(trace_id || '-' || eid || '/send'), 1, 16),
         'kafka/' || CASE WHEN v % 2 = 0 THEN 'even-numbers'
                          ELSE 'odd-numbers' END,
         CAST((v % 7) * 25 + 50 AS BIGINT)
  FROM best
), hc AS (
  SELECT h.*, c.n_spans FROM hops h JOIN cp c USING (trace_id)
), norms AS (
  SELECT n_spans, hop, CAST(sum(duration_us) AS BIGINT) AS class_sum,
         count(*) AS class_n
  FROM hc GROUP BY 1, 2
), blame AS (
  SELECT trace_id, n_spans, hop, span_id, service, duration_us,
         duration_us - CAST(class_sum AS DOUBLE) / class_n AS excess_us,
         row_number() OVER (PARTITION BY trace_id
           ORDER BY duration_us * class_n - class_sum DESC, hop DESC,
                    span_id DESC) AS rk
  FROM hc JOIN norms USING (n_spans, hop)
  WHERE trace_id IN (SELECT trace_id FROM slow))
SELECT trace_id, n_spans, CAST(hop AS INT) AS hop, span_id, service,
       duration_us, excess_us
FROM blame WHERE rk = 1""",

    // anomalously slow traces: critical path above mean + 2*stddev of
    // the trace's topology class (n_spans); same closed-form critical
    // path as q_critical_path, stddev = sample in both engines
    "q_trace_anomaly" -> """WITH ev AS (
  SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 16) AS trace_id,
         CAST(floor(value) AS BIGINT) AS value_int
  FROM events
), cp AS (
  SELECT trace_id, CAST(1 + 2 * count(*) AS BIGINT) AS n_spans,
         CAST(1000 + max(value_int * 10 + 100 + (value_int % 7) * 25 + 50) AS BIGINT)
           AS critical_path_us
  FROM ev GROUP BY trace_id
), st AS (
  SELECT n_spans AS ns, avg(critical_path_us) + 2 * stddev(critical_path_us) AS thr
  FROM cp GROUP BY 1)
SELECT trace_id, n_spans, critical_path_us
FROM cp JOIN st ON n_spans = ns
WHERE thr IS NOT NULL AND critical_path_us > thr""",

    // per-dependency-edge latency percentiles: each parent->child link
    // carries the CHILD span's duration; closed form of the modeled
    // tree's two edge families (gateway->app, app->kafka send)
    "q_edge_latency" -> """WITH ev AS (
  SELECT CAST(floor(value) AS BIGINT) AS value_int
  FROM events
), edges AS (
  SELECT 'gateway>graft-app' AS edge,
         CAST(value_int * 10 + 100 AS DOUBLE) AS d
  FROM ev
  UNION ALL
  SELECT 'graft-app>kafka/' || CASE WHEN value_int % 2 = 0 THEN 'even-numbers'
                                    ELSE 'odd-numbers' END,
         CAST((value_int % 7) * 25 + 50 AS DOUBLE)
  FROM ev)
SELECT edge, round(quantile_cont(d, 0.5), 4) AS p50_us,
       round(quantile_cont(d, 0.95), 4) AS p95_us
FROM edges GROUP BY edge""",

    // per-service span-duration percentiles over the same modeled span
    // tree; quantile_cont = the engine's exact histogram+lerp form
    "q_service_latency" -> """WITH ev AS (
  SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 16) AS trace_id,
         CAST(event_id AS VARCHAR) AS eid,
         CAST(floor(value) AS BIGINT) AS value_int
  FROM events
), spans AS (
  SELECT DISTINCT 'gateway' AS service, CAST(1000 AS DOUBLE) AS duration_us,
         trace_id AS uniq
  FROM ev
  UNION ALL
  SELECT 'graft-app', CAST(value_int * 10 + 100 AS DOUBLE),
         trace_id || '-' || eid
  FROM ev
  UNION ALL
  SELECT 'kafka/' || CASE WHEN value_int % 2 = 0 THEN 'even-numbers'
                          ELSE 'odd-numbers' END,
         CAST((value_int % 7) * 25 + 50 AS DOUBLE),
         trace_id || '-' || eid
  FROM ev)
SELECT service, round(quantile_cont(duration_us, 0.5), 4) AS p50_us,
       round(quantile_cont(duration_us, 0.95), 4) AS p95_us,
       round(quantile_cont(duration_us, 0.99), 4) AS p99_us
FROM spans GROUP BY service""",

    "q_union_back" -> s"""$REC
SELECT event_type, count(*) AS n, CAST(sum(value_int) AS BIGINT) AS sum_value
FROM (SELECT * FROM evens UNION ALL SELECT * FROM odds) GROUP BY event_type""",

    "a_pricing_summary" -> """SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_extendedprice), 4) AS avg_price,
  count(*) AS n
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",

    "a_segment_revenue" -> """SELECT c_mktsegment,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(DISTINCT o_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment""",

    // TPC-H Q10 shape: returned-item revenue per customer, top 20
    "a_returned_revenue" -> """SELECT c_custkey, c_name, n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20""",

    // TPC-H Q5 shape: same-nation customer/supplier revenue by region
    "a_region_volume" -> """SELECT r_name, n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name""",

    "a_top_orders" -> """SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, revenue FROM (
  SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem GROUP BY l_orderkey) r
JOIN orders ON l_orderkey = o_orderkey
ORDER BY revenue DESC, o_orderkey LIMIT 10""",

    "a_top_parts_per_brand" -> """WITH rev AS (
  SELECT p_brand, p_partkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand, p_partkey)
SELECT p_brand, p_partkey, revenue, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
  FROM rev)
WHERE rnk <= 3""",

    "a_semi_join" -> """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)""",

    "a_anti_join" -> """SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "a_rollup" -> """SELECT l_returnflag, l_linestatus, count(*) AS n,
  round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "a_cube" -> """SELECT l_returnflag, l_linestatus, count(*) AS n,
  round(sum(l_extendedprice), 2) AS sum_base
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",

    "a_percentiles" -> """SELECT l_returnflag,
  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
FROM lineitem GROUP BY l_returnflag""",

    // the engine computes this WITHOUT per-group buffers (histogram +
    // cumulative window + lerp); the oracle is the very same
    // quantile_cont statement as a_percentiles — exactness is the claim
    "a_percentiles_dist" -> """SELECT l_returnflag,
  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
FROM lineitem GROUP BY l_returnflag""",

    "a_tumbling_window" -> """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_start_us,
  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2""",

    // exact per-(tumbling hour, event_type) value percentiles —
    // quantile_cont is bit-compatible with the engine's shared
    // ExactPercentiles lerp (same convention as a_percentiles_dist)
    "a_windowed_percentiles" -> """SELECT
  epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_start_us,
  event_type,
  round(quantile_cont(value, 0.5), 4) AS p50,
  round(quantile_cont(value, 0.95), 4) AS p95
FROM events GROUP BY 1, 2""",

    // hopping window, size 30 min / slide 15 min: every event belongs
    // to exactly 2 epoch-aligned windows; window starts derived by
    // integer microsecond arithmetic over an unnested slide index
    "a_hopping_window" -> """SELECT
  (epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) * 900000000 - i * 900000000 AS hop_start_us,
  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events CROSS JOIN unnest([0, 1]) AS t(i)
GROUP BY 1, 2""",

    "a_session_window" -> """WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
), g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id, epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us, count(*) AS n_events
FROM sid GROUP BY user_id, sid""",

    "a_asof_join" -> AsOfJoinSql,
    // the spark.sql twin runs the same union+running-window rewrite
    // through the parser; it shares the native ASOF JOIN oracle
    "q_sql_asof" -> AsOfJoinSql,

    // the engine runs this as a two-phase SALTED aggregation; exact
    // integer-cent sums make the result independent of the salt split,
    // so the plain GROUP BY here is a true oracle for the salted plan
    "a_skew_salted" -> """SELECT l_returnflag,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
  count(*) AS n
FROM lineitem GROUP BY l_returnflag""",

    // pivot with explicit values == CASE-routed sums; a (priority,
    // flag) combination with no rows is NULL in both engines
    "a_pivot" -> """SELECT o_orderpriority,
  CAST(sum(CASE WHEN l_returnflag = 'A' THEN c END) AS BIGINT) AS A,
  CAST(sum(CASE WHEN l_returnflag = 'N' THEN c END) AS BIGINT) AS N,
  CAST(sum(CASE WHEN l_returnflag = 'R' THEN c END) AS BIGINT) AS R
FROM (SELECT o_orderpriority, l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
GROUP BY o_orderpriority""",

    "a_distinct_counts" -> """SELECT l_returnflag,
  count(DISTINCT l_partkey) AS n_parts,
  count(DISTINCT l_suppkey) AS n_supps,
  count(DISTINCT l_orderkey) AS n_orders,
  count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag""",

    "a_range_join" -> """SELECT o_orderkey, count(*) AS n_shipped_30d
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  AND l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderkey""",

    // interval-overlap join: the oracle replays the NAIVE inequality
    // join; the Spark side's bucketed equi-join + anchor-bucket
    // uniqueness must agree row-for-row, which pins the rewrite's
    // exactly-once algebra
    "a_interval_join" -> IntervalJoinSql,
    // the spark.sql twin computes the identical pair set through the
    // parser + analyzer, so it shares the naive-replay oracle verbatim
    "q_sql_interval" -> IntervalJoinSql,

    // daily sums are exact integer cents => the 7-row frame sum is
    // order-independent; DuckDB's sum() OVER widens BIGINT to HUGEINT,
    // hence the casts around the window expressions
    "a_moving_avg" -> """WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1)
SELECT epoch_us(CAST(d AS TIMESTAMP)) AS day_us, cents,
       round(CAST(sum(cents) OVER w AS DOUBLE) / (100.0 * count(*) OVER w), 4) AS ma7
FROM daily WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""",

    // overlapping token windows, size 64 stride 48; DuckDB list slicing
    // is inclusive and clamps, matching Spark's slice()
    "t_chunk" -> s"""$TOKS, d AS (
  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok FROM toks WHERE len(tk) > 0
), ex AS (
  SELECT doc_id, tk, unnest(range(0, CAST((n_tok + 47) // 48 AS BIGINT))) AS i FROM d)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_id,
       CAST(i * 48 AS BIGINT) AS tok_off,
       CAST(len(tk[i*48+1 : i*48+64]) AS BIGINT) AS n_chunk_tok,
       array_to_string(tk[i*48+1 : i*48+64], ' ') AS chunk_text
FROM ex""",

    // split-assignment census: the same stratum|id hash keying the
    // decontam family's eval holdout uses, so the censuses agree
    "e_split_assign" -> s"""WITH d AS (
  SELECT lang,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              t -> len(t) > 0)) AS BIGINT) AS nt,
         ${dh("lang || '|' || CAST(doc_id AS VARCHAR)")} % 100 AS h
  FROM documents)
SELECT lang,
       CASE WHEN h < 20 THEN 'eval' WHEN h < 30 THEN 'val'
            ELSE 'train' END AS split,
       count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
FROM d GROUP BY 1, 2""",

    // intra-doc repeated-span removal: first 5-gram occurrence wins,
    // later occurrences cover their five positions, ordered rebuild
    "t_repetition_apply" -> s"""$TOKS, tp AS (
  SELECT doc_id, unnest(range(0, len(tk))) AS pos, tk FROM toks
), tok AS (SELECT doc_id, pos, tk[CAST(pos + 1 AS INT)] AS tok FROM tp
), gp AS (
  SELECT doc_id, unnest(range(0, greatest(len(tk) - 4, 0))) AS p, tk FROM toks
), g AS (
  SELECT doc_id, p,
         array_to_string(tk[CAST(p + 1 AS INT):CAST(p + 5 AS INT)], ' ') AS g
  FROM gp
), firsts AS (SELECT doc_id, g, min(p) AS p0 FROM g GROUP BY 1, 2
), cov0 AS (
  SELECT g.doc_id, unnest(range(g.p, g.p + 5)) AS pos
  FROM g JOIN firsts f ON f.doc_id = g.doc_id AND f.g = g.g
  WHERE g.p > f.p0
), covered AS (SELECT DISTINCT doc_id, pos FROM cov0
), rb AS (
  SELECT t.doc_id, count(*) AS n_kept,
         string_agg(t.tok, ' ' ORDER BY t.pos) AS dedup_text
  FROM tok t LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
  WHERE c.pos IS NULL
  GROUP BY t.doc_id)
SELECT toks.doc_id, CAST(len(tk) AS BIGINT) AS n_tok,
       CAST(coalesce(rb.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(tk) - coalesce(rb.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(rb.dedup_text, '') AS dedup_text
FROM toks LEFT JOIN rb ON rb.doc_id = toks.doc_id""",

    "t_repetition" -> s"""$TOKS, dup AS (
  SELECT doc_id,
         round(CASE WHEN len(${shinglesN(3)}) > 0
                    THEN 1.0 - CAST(len(list_distinct(${shinglesN(3)})) AS DOUBLE)
                         / len(${shinglesN(3)})
                    ELSE 0.0 END, 4) AS dup_3gram_frac
  FROM toks
), tc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks) GROUP BY 1, 2
), top AS (
  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_tok_frac
  FROM tc GROUP BY doc_id)
SELECT dup.doc_id, dup.dup_3gram_frac,
       coalesce(top.top_tok_frac, 0.0) AS top_tok_frac
FROM dup LEFT JOIN top ON dup.doc_id = top.doc_id""",

    "t_mix_weights" -> s"""WITH d AS (
  SELECT source, lang,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              t -> len(t) > 0)) AS BIGINT) AS nt
  FROM documents
), strata AS (
  SELECT source, lang, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_tokens
  FROM d GROUP BY 1, 2
), corpus AS (SELECT CAST(sum(nt) AS BIGINT) AS corpus_tokens FROM d)
SELECT source, lang, n_docs, total_tokens,
       round(CAST(total_tokens AS DOUBLE) / corpus_tokens, 6) AS tok_share
FROM strata CROSS JOIN corpus""",

    "t_text_stats" -> s"""$TOKS
SELECT doc_id,
  CAST(len(tk) AS BIGINT) AS n_tok,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe,
  CAST(length(text) AS BIGINT) AS n_chars_calc,
  round(CASE WHEN len(tk) > 0
             THEN CAST(list_sum(list_transform(tk, t -> len(t))) AS DOUBLE) / len(tk)
             ELSE 0.0 END, 4) AS avg_tok_len
FROM toks""",

    // tokenizer fertility per lang: subword / whitespace token ratio
    // in e4 truncating fixed point over exact integer counts
    "t_fertility" -> s"""$TOKS
SELECT lang, count(*) AS n_docs,
  CAST(sum(len(tk)) AS BIGINT) AS tok_total,
  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpe_total,
  CASE WHEN sum(len(tk)) > 0
       THEN CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
              * 10000 // CAST(sum(len(tk)) AS BIGINT)
       ELSE 0 END AS fertility_e4
FROM toks GROUP BY lang""",

    "t_lang_id" -> s"""$TOKS
SELECT doc_id, lang,
  CASE WHEN zh > 0 THEN 'zh'
       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       WHEN s_de >= s_fr THEN 'de'
       ELSE 'fr' END AS pred_lang
FROM (SELECT doc_id, lang,
        len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS zh,
        len(list_filter(tk, t -> t IN ('the','and','of','to','is','in','a'))) AS s_en,
        len(list_filter(tk, t -> t IN ('el','la','de','que','y','los','es'))) AS s_es,
        len(list_filter(tk, t -> t IN ('der','die','und','das','ist','nicht'))) AS s_de,
        len(list_filter(tk, t -> t IN ('le','les','et','des','un','une','est'))) AS s_fr
      FROM toks)""",

    "t_quality" -> s"""$TOKS
SELECT doc_id, round($QUALITY, 4) AS quality
FROM toks""",

    "t_quality_filter" -> s"""$TOKS
SELECT doc_id, lang, quality, n_tok FROM (
  SELECT doc_id, lang, round($QUALITY, 4) AS quality,
         CAST(len(tk) AS BIGINT) AS n_tok
  FROM toks)
WHERE quality >= 0.5 AND n_tok BETWEEN 10 AND 200""",

    "t_lang_stats" -> s"""$TOKS
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(tk)) AS BIGINT) AS total_tokens,
       round(avg($QUALITY), 4) AS avg_quality
FROM toks GROUP BY lang""",

    "d_dedup_apply" -> s"""WITH norm AS (
  SELECT doc_id, lang, source, n_chars,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS ntext
  FROM documents
), grp AS (
  SELECT ${dh("ntext")} AS text_hash, CAST(length(ntext) AS BIGINT) AS text_len,
         min(doc_id) AS keeper
  FROM norm GROUP BY 1, 2)
SELECT n.doc_id, n.lang, n.source, n.n_chars
FROM norm n JOIN grp g ON n.doc_id = g.keeper""",

    "t_fingerprint" -> s"""$TOKS
SELECT doc_id,
  ${dh("regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")} AS fp,
  list_min(list_transform($SHINGLES3, s -> ${dh("s")})) AS min_shingle_fp
FROM toks""",

    "t_bigram_topk" -> s"""$TOKS
SELECT bigram, count(*) AS doc_freq FROM (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, greatest(len(tk)-1, 0)+1),
                   i -> array_to_string(tk[i:i+1], ' ')))) AS bigram
  FROM toks)
GROUP BY bigram ORDER BY doc_freq DESC, bigram LIMIT 30""",

    "t_vocab_topk" -> s"""$TOKS
SELECT token, count(*) AS doc_freq FROM (
  SELECT doc_id, unnest(list_distinct(tk)) AS token FROM toks)
GROUP BY token ORDER BY doc_freq DESC, token LIMIT 50""",

    // corpus side of PII redaction: the fixture is clean, so the gate
    // checks redaction is the identity with zero hits (no false
    // positives); planted-PII behavior is pinned in ExtSpec
    "t_redact" -> s"""SELECT doc_id,
  regexp_replace(regexp_replace(text, '${graft.ext.TextOps.EmailPat}', '<EMAIL>', 'g'),
                 '${graft.ext.TextOps.UrlPat}', '<URL>', 'g') AS clean_text,
  CAST(len(regexp_extract_all(text, '${graft.ext.TextOps.EmailPat}'))
     + len(regexp_extract_all(text, '${graft.ext.TextOps.UrlPat}')) AS BIGINT) AS n_redacted
FROM documents""",

    // idf is the RATIO N/df (not ln): bit-identical across engines
    "t_tfidf_topk" -> s"""$TOKS, t AS (
  SELECT doc_id, unnest(tk) AS token FROM toks
), tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2
), dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, token, tf, df, tf * (CAST(n_docs AS DOUBLE) / df) AS score
  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       round(score, 4) AS score, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
  FROM scored)
WHERE rnk <= 3""",

    "d_stratified_sample" -> s"""SELECT doc_id, lang, source FROM documents
WHERE ${dh("lang || '|' || CAST(doc_id AS VARCHAR)")} % 100 < 20""",

    // naive global-window cumsum — the independent check of the
    // engine's two-phase distributed form
    "t_pack_sequences" -> s"""$TOKS
SELECT doc_id, n_tok, tok_start, tok_start // 2048 AS chunk_id FROM (
  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok,
         CAST(sum(len(tk)) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - len(tk) AS BIGINT) AS tok_start
  FROM toks)""",

    "d_contamination" -> s"""$LSH_PAIRS, marks AS (
  SELECT doc_id, ${dh("lang || '|' || CAST(doc_id AS VARCHAR)")} % 100 < 20 AS is_eval
  FROM documents)
SELECT doc_a, doc_b, jaccard,
       CASE WHEN ma.is_eval THEN doc_a ELSE doc_b END AS eval_doc
FROM pairs
JOIN marks ma ON ma.doc_id = doc_a
JOIN marks mb ON mb.doc_id = doc_b
WHERE ma.is_eval <> mb.is_eval""",

    // exact phrase-overlap decontamination: train x eval pairs sharing
    // at least one 5-gram, counted per pair
    "d_contamination_ngram" -> s"""$TOKS, sh5 AS (
  SELECT doc_id, unnest(list_distinct(${shinglesN(5)})) AS s FROM toks
), h5 AS (SELECT doc_id, ${dh("s")} AS h FROM sh5
), marks AS (
  SELECT doc_id, ${dh("lang || '|' || CAST(doc_id AS VARCHAR)")} % 100 < 20 AS is_eval
  FROM documents)
SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc, count(*) AS n_shared
FROM h5 t JOIN marks mt ON mt.doc_id = t.doc_id AND NOT mt.is_eval
JOIN h5 e ON e.h = t.h
JOIN marks me ON me.doc_id = e.doc_id AND me.is_eval
GROUP BY 1, 2""",

    // bloom-prefiltered decontamination: the oracle is the EXACT
    // train x eval gram join with no bloom anywhere — the engine's
    // bloom prefilter must be invisible in the result
    "d_contamination_bloom" -> s"""$TOKS, sh5 AS (
  SELECT doc_id, unnest(list_distinct(${shinglesN(5)})) AS s FROM toks
), h5 AS (SELECT doc_id, ${dh("s")} AS h FROM sh5
), marks AS (
  SELECT doc_id, ${dh("lang || '|' || CAST(doc_id AS VARCHAR)")} % 100 < 20 AS is_eval
  FROM documents)
SELECT t.doc_id AS train_doc, count(DISTINCT e.doc_id) AS n_eval_docs,
       count(*) AS n_shared
FROM h5 t JOIN marks mt ON mt.doc_id = t.doc_id AND NOT mt.is_eval
JOIN h5 e ON e.h = t.h
JOIN marks me ON me.doc_id = e.doc_id AND me.is_eval
GROUP BY 1""",

    // maximal duplicated 5-gram spans: positional grams (NOT distinct),
    // duplicated = >= 2 occurrences corpus-wide, islands merge
    // positions <= 5 apart (adjacent-or-overlapping duplicated grams)
    "d_span_dedup" -> s"""$TOKS, posn AS (
  SELECT doc_id, unnest(range(1, greatest(len(tk)-4, 0)+1)) AS i, tk FROM toks
), g AS (
  SELECT doc_id, CAST(i-1 AS BIGINT) AS pos,
         ${dh("array_to_string(tk[i:i+4], ' ')")} AS h
  FROM posn
), dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2
), dp AS (
  SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM g WHERE h IN (SELECT h FROM dup)
), isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NOT NULL AND pos - prev <= 5 THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM dp)
SELECT doc_id, min(pos) AS span_start, CAST(max(pos)+4 AS BIGINT) AS span_end,
       count(*) AS n_grams
FROM isl GROUP BY doc_id, island""",

    // per-doc duplicated-token fraction over the maximal spans above;
    // spans never overlap within a doc, so summing widths is exact
    // the APPLY step: same span derivation as d_span_dedup, then every
    // token inside a span is dropped and the remainder re-joined
    "d_span_apply" -> s"""$TOKS, posn AS (
  SELECT doc_id, unnest(range(1, greatest(len(tk)-4, 0)+1)) AS i, tk FROM toks
), g AS (
  SELECT doc_id, CAST(i-1 AS BIGINT) AS pos,
         ${dh("array_to_string(tk[i:i+4], ' ')")} AS h
  FROM posn
), dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2
), dp AS (
  SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM g WHERE h IN (SELECT h FROM dup)
), isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NOT NULL AND pos - prev <= 5 THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM dp
), spans AS (
  SELECT doc_id, min(pos) AS s, max(pos)+4 AS e FROM isl GROUP BY doc_id, island
), tok AS (
  SELECT doc_id, CAST(j-1 AS BIGINT) AS p, tk[j] AS t
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk)+1)) AS j FROM toks)
), keep AS (
  SELECT k.doc_id, k.p, k.t FROM tok k
  WHERE NOT EXISTS (SELECT 1 FROM spans sp
                    WHERE sp.doc_id = k.doc_id AND k.p BETWEEN sp.s AND sp.e)
), agg AS (
  SELECT doc_id, array_to_string(list(t ORDER BY p), ' ') AS clean_text,
         count(*) AS n_kept
  FROM keep GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       CAST(len(t.tk) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM toks t LEFT JOIN agg a USING (doc_id)""",

    "d_span_fraction" -> s"""$TOKS, posn AS (
  SELECT doc_id, unnest(range(1, greatest(len(tk)-4, 0)+1)) AS i, tk FROM toks
), g AS (
  SELECT doc_id, CAST(i-1 AS BIGINT) AS pos,
         ${dh("array_to_string(tk[i:i+4], ' ')")} AS h
  FROM posn
), dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2
), dp AS (
  SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM g WHERE h IN (SELECT h FROM dup)
), isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NOT NULL AND pos - prev <= 5 THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM dp
), spans AS (
  SELECT doc_id, min(pos) AS span_start, CAST(max(pos)+4 AS BIGINT) AS span_end
  FROM isl GROUP BY doc_id, island
), per_doc AS (
  SELECT doc_id, sum(span_end - span_start + 1) AS dup_tokens FROM spans GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tok,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(CASE WHEN len(t.tk) > 0
             THEN CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / len(t.tk)
             ELSE 0.0 END, 4) AS dup_frac
FROM toks t LEFT JOIN per_doc p ON p.doc_id = t.doc_id""",

    // cross-doc maximal substrings via bucketed suffix ordering —
    // mirror of Dedup.crossDocSubstrings over the shared SUBSTR_M
    // matched-positions CTE chain (see its comment above queries)
    "d_substring_dedup" -> s"""$SUBSTR_M, st AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_starts, max(match_len) AS max_len
  FROM mm GROUP BY 1
)
SELECT st.doc_id, st.n_dup_starts, st.max_len, max(mm.sub) AS longest_sub
FROM st JOIN mm ON mm.doc_id = st.doc_id AND mm.match_len = st.max_len
GROUP BY 1, 2, 3""",

    // char-level cross-doc maximal substrings: same bucketed suffix
    // ordering over the character stream (mirror of
    // Dedup.crossDocSubstringsChar at n=20, maxLcp=80)
    "d_substring_char" -> s"""$SUBSTR_CHAR_M, st AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_starts, max(match_len) AS max_len
  FROM mm GROUP BY 1
)
SELECT st.doc_id, st.n_dup_starts, st.max_len, max(mm.sub) AS longest_sub
FROM st JOIN mm ON mm.doc_id = st.doc_id AND mm.match_len = st.max_len
GROUP BY 1, 2, 3""",

    // char-level dup fraction: the same island sweep continues from
    // the char chain's mm; denominator = normalized char count
    "d_substring_char_fraction" -> s"""$SUBSTR_CHAR_M, $SUBSTR_ISL, pd AS (
  SELECT doc_id, sum(e0 - s0 + 1) AS dup_chars FROM sp GROUP BY 1)
SELECT n.doc_id, CAST(length(n.txt) AS BIGINT) AS n_chars,
       CAST(coalesce(p.dup_chars, 0) AS BIGINT) AS dup_chars,
       round(CASE WHEN length(n.txt) > 0
             THEN CAST(coalesce(p.dup_chars, 0) AS DOUBLE) / length(n.txt)
             ELSE 0.0 END, 4) AS dup_frac
FROM nx n LEFT JOIN pd p ON p.doc_id = n.doc_id""",

    // char-level APPLY: cut every character inside a cross-doc island
    "d_substring_char_apply" -> s"""$SUBSTR_CHAR_M, $SUBSTR_ISL, ct AS (
  SELECT doc_id, CAST(j-1 AS BIGINT) AS p, substr(txt, CAST(j AS INT), 1) AS c
  FROM (SELECT doc_id, txt, unnest(range(1, length(txt)+1)) AS j FROM nx)
), keep AS (
  SELECT k.doc_id, k.p, k.c FROM ct k
  WHERE NOT EXISTS (SELECT 1 FROM sp
                    WHERE sp.doc_id = k.doc_id AND k.p BETWEEN sp.s0 AND sp.e0)
), agg AS (
  SELECT doc_id, array_to_string(list(c ORDER BY p), '') AS clean_text,
         count(*) AS n_kept
  FROM keep GROUP BY doc_id)
SELECT n.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       CAST(length(n.txt) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM nx n LEFT JOIN agg a USING (doc_id)""",

    // interval-union (running-max island sweep) of the matched
    // positions -> per-doc cross-doc duplicated-token fraction
    "d_substring_fraction" -> s"""$SUBSTR_M, $SUBSTR_ISL, pd AS (
  SELECT doc_id, sum(e0 - s0 + 1) AS dup_tokens FROM sp GROUP BY 1)
SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tok,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(CASE WHEN len(t.tk) > 0
             THEN CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / len(t.tk)
             ELSE 0.0 END, 4) AS dup_frac
FROM toks t LEFT JOIN pd p ON p.doc_id = t.doc_id""",

    // the APPLY: cut every token inside a cross-doc island, re-join
    // the remainder (same cut mechanics as d_span_apply)
    "d_substring_apply" -> s"""$SUBSTR_M, $SUBSTR_ISL, tok AS (
  SELECT doc_id, CAST(j-1 AS BIGINT) AS p, tk[j] AS t
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk)+1)) AS j FROM toks)
), keep AS (
  SELECT k.doc_id, k.p, k.t FROM tok k
  WHERE NOT EXISTS (SELECT 1 FROM sp
                    WHERE sp.doc_id = k.doc_id AND k.p BETWEEN sp.s0 AND sp.e0)
), agg AS (
  SELECT doc_id, array_to_string(list(t ORDER BY p), ' ') AS clean_text,
         count(*) AS n_kept
  FROM keep GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       CAST(len(t.tk) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM toks t LEFT JOIN agg a USING (doc_id)""",

    // minhash-estimated jaccard over LSH candidate pairs: fraction of
    // agreeing signature components
    "d_minhash_jaccard_est" -> s"""$LSH_CANDS
SELECT c.doc_a, c.doc_b,
       round((${(0 until 16).map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")}) / 16.0, 4) AS est_jaccard
FROM cands c JOIN sig a ON a.doc_id = c.doc_a JOIN sig b ON b.doc_id = c.doc_b""",

    // corpus-bigram LM commonness: avg document-frequency over bigram
    // occurrences, exact integer counts until one final division
    "t_bigram_lm" -> s"""$TOKS, bi AS (
  SELECT doc_id, unnest(${shinglesN(2)}) AS s FROM toks
), dfreq AS (SELECT s, count(DISTINCT doc_id) AS df FROM bi GROUP BY s)
SELECT doc_id, count(*) AS n_bigrams,
       round(CAST(sum(df) AS DOUBLE) / count(*), 4) AS avg_df
FROM bi JOIN dfreq USING (s)
GROUP BY doc_id""",

    // log-space conditional bigram LM: add-one-smoothed p(w2|w1) over
    // the corpus's own counts, per-doc mean −ln p (mirror of
    // TextOps.bigramCrossEntropy)
    "t_bigram_ppl" -> s"""$TOKS, occ AS (
  SELECT doc_id, unnest(${shinglesN(2)}) AS s FROM toks
), c2 AS (SELECT s, count(*) AS c2 FROM occ GROUP BY s
), c1 AS (SELECT string_split(s, ' ')[1] AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1
), v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(tk) AS t FROM toks)
), model AS (
  SELECT c2.s, ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v)) AS logp
  FROM c2 JOIN c1 ON string_split(c2.s, ' ')[1] = c1.w1 CROSS JOIN v
)
SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(-sum(m.logp) / count(*), 4) AS xent_nats
FROM occ JOIN model m USING (s)
GROUP BY occ.doc_id""",

    // perplexity-filter gate: per-doc xent replayed from the bigram-LM
    // chain, per-lang median via quantile_cont (the ExactPercentiles
    // lerp), keep = xent <= cutoff
    "e_ppl_filter" -> s"""$TOKS, occ AS (
  SELECT doc_id, unnest(${shinglesN(2)}) AS s FROM toks
), c2 AS (SELECT s, count(*) AS c2 FROM occ GROUP BY s
), c1 AS (SELECT string_split(s, ' ')[1] AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1
), v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(tk) AS t FROM toks)
), model AS (
  SELECT c2.s, ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v)) AS logp
  FROM c2 JOIN c1 ON string_split(c2.s, ' ')[1] = c1.w1 CROSS JOIN v
), x AS (
  SELECT occ.doc_id, round(-sum(m.logp) / count(*), 4) AS xent
  FROM occ JOIN model m USING (s) GROUP BY occ.doc_id
), xl AS (
  SELECT d.lang, x.xent FROM x JOIN documents d USING (doc_id)
), cut AS (
  SELECT lang, quantile_cont(xent, 0.5) AS cutoff FROM xl GROUP BY lang)
SELECT xl.lang, count(*) AS n_scored,
       CAST(sum(CASE WHEN xent <= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(cut.cutoff, 4) AS cutoff_nats,
       CAST(sum(CASE WHEN xent <= cutoff THEN 1 ELSE 0 END) AS BIGINT)
         * 10000 // count(*) AS kept_frac_e4
FROM xl JOIN cut USING (lang)
GROUP BY xl.lang, cut.cutoff""",

    // exact heavy hitters: the oracle is the sketch-free GROUP BY +
    // integer-arithmetic HAVING — phase 2 of the engine's two-phase
    // Misra–Gries form must erase every surplus candidate to match
    "t_heavy_hitters" -> HeavyHittersSql,
    // the spark.sql twin (registered misra_gries_1024 aggregate, one
    // statement, no driver collect) reduces to the identical exact
    // set — the mergeable-summaries guarantee plus the integer HAVING
    "q_sql_heavy" -> HeavyHittersSql,

    // BM25 retrieval: the query is DERIVED (df-rank window 11..13), so
    // the oracle rebuilds the identical query; constants are CAST to
    // DOUBLE (bare decimals are DECIMAL in DuckDB and would change
    // the division); ranking compares the ROUNDED score
    "t_bm25_topk" -> s"""$TOKS, occ AS (
  SELECT doc_id, unnest(tk) AS tok FROM toks
), dl AS (SELECT doc_id, count(*) AS dl FROM occ GROUP BY 1
), st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
), dfr AS (
  SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM occ) GROUP BY 1
), qt AS (
  SELECT tok, df FROM (
    SELECT tok, df, row_number() OVER (ORDER BY df DESC, tok) AS r FROM dfr)
  WHERE r > 10 AND r <= 13
), tf AS (
  SELECT o.doc_id, o.tok, qt.df, count(*) AS tf
  FROM occ o JOIN qt ON o.tok = qt.tok GROUP BY 1, 2, 3
), sc AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))) *
              (tf * CAST(2.2 AS DOUBLE)) /
              (tf + CAST(1.2 AS DOUBLE) *
                (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl /
                 (CAST(sum_dl AS DOUBLE) / n_docs))) ) AS score,
         count(*) AS n_terms_hit
  FROM tf JOIN dl USING (doc_id) CROSS JOIN st GROUP BY 1)
SELECT doc_id, round(score, 4) AS score, CAST(n_terms_hit AS BIGINT) AS n_terms_hit
FROM sc ORDER BY round(score, 4) DESC, doc_id LIMIT 20""",

    // top collocations by PMI over bigram occurrences, min support 5;
    // products taken in double in the engine's exact order
    "t_pmi_topk" -> s"""$TOKS, occ AS (
  SELECT doc_id, unnest(${shinglesN(2)}) AS s FROM toks
), uni AS (
  SELECT t, count(*) AS c1 FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY 1
), tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_uni FROM uni
), nb AS (SELECT count(*) AS n_bi FROM occ
), bi AS (SELECT s, count(*) AS c2 FROM occ GROUP BY 1 HAVING count(*) >= 5
), j AS (
  SELECT bi.s, bi.c2, ux.c1 AS cx, uy.c1 AS cy
  FROM bi JOIN uni ux ON string_split(bi.s, ' ')[1] = ux.t
          JOIN uni uy ON string_split(bi.s, ' ')[2] = uy.t)
SELECT s AS bigram, CAST(c2 AS BIGINT) AS n_occ,
       round(ln((CAST(c2 AS DOUBLE) * n_uni * n_uni) /
                (CAST(n_bi AS DOUBLE) * cx * cy)), 4) AS pmi
FROM j CROSS JOIN tot CROSS JOIN nb
ORDER BY pmi DESC, bigram LIMIT 50""",

    // k-anonymity audit: QI group sizes + at-risk flag, exact integers
    "a_k_anonymity" -> """SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
       count(*) AS group_size,
       (count(*) < 5) AS at_risk
FROM customer GROUP BY 1, 2, 3""",

    // per-group OLS trend from exact integer moments; slope/intercept
    // computed in double with the engine's exact operation order
    "a_trend" -> TREND_SQL,

    // the incremental (partials-merged) form must equal the from-
    // scratch computation, so its oracle IS the full-data trend SQL —
    // the mergeable-moments claim proved on the gate
    "a_trend_incremental" -> TREND_SQL,

    // Q8-shaped market share: focal nation's revenue share of the
    // ASIA market per order year
    "a_market_share" -> """WITH j AS (
  SELECT year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS rev,
         sn.n_name AS s_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey)
SELECT CAST(o_year AS INT) AS o_year,
       round(sum(CASE WHEN s_nation = 'NATION_3' THEN rev ELSE 0.0 END) /
             sum(rev), 4) AS mkt_share
FROM j GROUP BY 1""",

    // Q11-shaped global-threshold HAVING on exact fixed-point revenue
    "a_important_parts" -> """WITH rev AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) *
         (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_fx
  FROM lineitem
), bp AS (SELECT l_partkey, CAST(sum(rev_fx) AS BIGINT) AS value_fx FROM rev GROUP BY 1
), tot AS (SELECT CAST(sum(value_fx) AS BIGINT) AS total_fx FROM bp)
SELECT l_partkey, round(value_fx / 10000.0, 2) AS value
FROM bp CROSS JOIN tot
WHERE value_fx * 1500 > total_fx""",

    // brand-keyed rank functions with a unique order
    "a_price_ranks" -> """SELECT p_partkey, p_brand,
       CAST(ntile(4) OVER w AS INT) AS price_quartile,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist() OVER w, 4) AS cume
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)""",

    // customer cohorts by order era via INTERSECT / EXCEPT
    "a_except_intersect" -> """WITH early AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
), late AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
SELECT 'retained' AS cohort, count(*) AS n_customers
  FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
UNION ALL
SELECT 'churned', count(*) FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
UNION ALL
SELECT 'acquired', count(*) FROM (SELECT * FROM late EXCEPT SELECT * FROM early)""",

    // the Q1 summary melted to long form
    "a_unpivot" -> """WITH base AS (
  SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         CAST(count(*) AS DOUBLE) AS count_order
  FROM lineitem GROUP BY 1, 2)
SELECT l_returnflag, l_linestatus, 'sum_qty' AS metric, sum_qty AS value FROM base
UNION ALL
SELECT l_returnflag, l_linestatus, 'sum_price', sum_price FROM base
UNION ALL
SELECT l_returnflag, l_linestatus, 'count_order', count_order FROM base""",

    // per-day distinct users, exact + KMV estimate (the t_kmv_distinct
    // estimator per day; sub-k days fall back to the exact count)
    "a_daily_distinct" -> s"""WITH ev AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
         ${dh("CAST(user_id AS VARCHAR)")} AS h
  FROM events
), kth AS (
  SELECT day, h AS h_k FROM (
    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM ev)
  WHERE rn = 16
), ex AS (SELECT day, count(*) AS exact_distinct FROM ev GROUP BY 1)
SELECT ex.day, ex.exact_distinct,
       CASE WHEN kth.h_k IS NOT NULL
            THEN CAST(round(15.0 * 72057594037927936 / kth.h_k) AS BIGINT)
            ELSE ex.exact_distinct END AS est_distinct
FROM ex LEFT JOIN kth USING (day)""",

    // one-pass KMV form: the oracle rebuilds the sketch's k-min set
    // with a rank window — identical set, identical estimator
    "a_daily_distinct_kmv" -> KmvDailySql,
    // the spark.sql twin (registered kmv_sketch aggregate + built-in
    // estimator) computes the identical estimate through the parser
    "q_sql_kmv" -> KmvDailySql,

    // quartile binning + weight of evidence vs the return flag; the
    // engine's exact interpolated percentiles are bit-compatible with
    // quantile_cont (the a_percentiles_dist contract)
    "a_woe_bins" -> """WITH qs AS (
  SELECT quantile_cont(l_extendedprice, 0.25) AS q25,
         quantile_cont(l_extendedprice, 0.5) AS q50,
         quantile_cont(l_extendedprice, 0.75) AS q75
  FROM lineitem
), b AS (
  SELECT CASE WHEN l_extendedprice <= q25 THEN 0
              WHEN l_extendedprice <= q50 THEN 1
              WHEN l_extendedprice <= q75 THEN 2 ELSE 3 END AS bin,
         (l_returnflag = 'R') AS ret
  FROM lineitem CROSS JOIN qs
), agg AS (
  SELECT bin,
         CAST(sum(CASE WHEN ret THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
         CAST(sum(CASE WHEN ret THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
  FROM b GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_returned) AS BIGINT) AS tr,
         CAST(sum(n_kept) AS BIGINT) AS tk FROM agg)
SELECT bin, n_returned, n_kept,
       round(ln((CAST(n_returned AS DOUBLE) / tr) /
                (CAST(n_kept AS DOUBLE) / tk)), 4) AS woe
FROM agg CROSS JOIN tot""",

    // heaviest join keys with row share — the skew diagnosis report
    "p_skew_report" -> """WITH tot AS (SELECT count(*) AS n_total FROM lineitem)
SELECT l_partkey, count(*) AS n,
       round(CAST(count(*) AS DOUBLE) / n_total, 4) AS share
FROM lineitem CROSS JOIN tot
GROUP BY 1, n_total
ORDER BY n DESC, l_partkey LIMIT 10""",

    // first/last-touch attribution inside a 6h lookback; left join
    // keeps unattributed purchases
    "a_attribution" -> """WITH p AS (
  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id AS v_user, epoch_us(ts) AS v_us
  FROM events WHERE event_type = 'view')
SELECT p.p_id, p.user_id, p.p_us,
       min(v.v_us) AS first_touch_us, max(v.v_us) AS last_touch_us,
       count(v.v_us) AS n_touch_views
FROM p LEFT JOIN v
  ON v.v_user = p.user_id AND v.v_us < p.p_us AND v.v_us >= p.p_us - 21600000000
GROUP BY 1, 2, 3""",

    // bounded-lookback attribution: only the 8 newest in-window views
    // count (min/max/count are rank-tie-proof: tied v_us values give
    // the same aggregated multiset whichever row holds rank 8)
    "a_attribution_bounded" -> """WITH p AS (
  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id AS v_user, epoch_us(ts) AS v_us
  FROM events WHERE event_type = 'view'
), j AS (
  SELECT p.p_id, p.user_id, p.p_us, v.v_us,
         row_number() OVER (PARTITION BY p.p_id ORDER BY v.v_us DESC) AS rk
  FROM p LEFT JOIN v
    ON v.v_user = p.user_id AND v.v_us < p.p_us
       AND v.v_us >= p.p_us - 21600000000)
SELECT p_id, user_id, p_us,
       min(v_us) AS first_touch_us, max(v_us) AS last_touch_us,
       count(v_us) AS n_touch_views
FROM j WHERE rk <= 8 GROUP BY 1, 2, 3""",

    // conversion-lag percentiles over attributed purchases;
    // quantile_cont is bit-compatible with the engine's exact
    // histogram+lerp (the a_percentiles_dist contract)
    "a_conversion_lag" -> """WITH p AS (
  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id AS v_user, epoch_us(ts) AS v_us
  FROM events WHERE event_type = 'view'
), att AS (
  SELECT p.p_id, p.p_us, max(v.v_us) AS lt
  FROM p JOIN v
    ON v.v_user = p.user_id AND v.v_us < p.p_us AND v.v_us >= p.p_us - 21600000000
  GROUP BY 1, 2
), lg AS (SELECT CAST(p_us - lt AS DOUBLE) AS x FROM att)
SELECT 'q25' AS qname, round(quantile_cont(x, 0.25), 4) AS lag_us FROM lg
UNION ALL SELECT 'q50', round(quantile_cont(x, 0.5), 4) FROM lg
UNION ALL SELECT 'q75', round(quantile_cont(x, 0.75), 4) FROM lg
UNION ALL SELECT 'q90', round(quantile_cont(x, 0.9), 4) FROM lg""",

    // event-type transition matrix with per-source probabilities
    "a_transitions" -> """WITH nx AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
), agg AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4) AS p
FROM agg""",

    // one-pass column profiler: per-column nulls, distincts, numeric
    // min/max; the oracle is the per-column UNION of the same stats
    "p_profile" -> """SELECT 'event_id' AS col_name, count(*) AS n_rows,
       count(*) - count(event_id) AS n_nulls,
       count(DISTINCT event_id) AS n_distinct,
       round(min(CAST(event_id AS DOUBLE)), 4) AS min_val,
       round(max(CAST(event_id AS DOUBLE)), 4) AS max_val
FROM events
UNION ALL
SELECT 'user_id', count(*), count(*) - count(user_id),
       count(DISTINCT user_id),
       round(min(CAST(user_id AS DOUBLE)), 4), round(max(CAST(user_id AS DOUBLE)), 4)
FROM events
UNION ALL
SELECT 'value', count(*), count(*) - count(value),
       count(DISTINCT value), round(min(value), 4), round(max(value), 4)
FROM events
UNION ALL
SELECT 'event_type', count(*), count(*) - count(event_type),
       count(DISTINCT event_type), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM events
UNION ALL
SELECT 'props', count(*), count(*) - count(props),
       count(DISTINCT props), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM events""",

    // referential-integrity + domain audit: one violation count per rule
    "p_fk_violations" -> """SELECT 'lineitem.l_orderkey -> orders.o_orderkey' AS rule,
       count(*) AS n_violations
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders.o_custkey -> customer.c_custkey', count(*)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer.c_nationkey -> nation.n_nationkey', count(*)
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
UNION ALL
SELECT 'lineitem.l_quantity > 0', count(*)
FROM lineitem WHERE l_quantity <= 0""",

    // CCNet-style head/middle/tail buckets over the commonness score,
    // cutoffs at mean ± stddev/2 of the per-doc score
    "t_quality_buckets" -> s"""$TOKS, bi AS (
  SELECT doc_id, unnest(${shinglesN(2)}) AS s FROM toks
), dfreq AS (SELECT s, count(DISTINCT doc_id) AS df FROM bi GROUP BY s
), lm AS (
  SELECT doc_id, round(CAST(sum(df) AS DOUBLE) / count(*), 4) AS avg_df
  FROM bi JOIN dfreq USING (s) GROUP BY doc_id
), st AS (SELECT avg(avg_df) AS mu, stddev(avg_df) AS sigma FROM lm)
SELECT CASE WHEN avg_df >= mu + sigma / 2 THEN 'head'
            WHEN avg_df < mu - sigma / 2 THEN 'tail'
            ELSE 'middle' END AS bucket,
       count(*) AS n_docs,
       round(avg(avg_df), 4) AS mean_score,
       min(avg_df) AS min_score,
       max(avg_df) AS max_score
FROM lm CROSS JOIN st
GROUP BY 1""",

    // incremental batch-vs-corpus near-dup pairs (batch = doc_id%10==0)
    "d_incremental_dedup" -> s"""$INCR_PAIRS
SELECT batch_doc, corpus_doc, jaccard FROM ipairs""",

    // admission decision: batch docs with no corpus near-dup
    "d_incremental_apply" -> s"""$INCR_PAIRS
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id % 10 = 0
  AND d.doc_id NOT IN (SELECT batch_doc FROM ipairs)""",

    // mixture rebalance toward half the equal token share: floor-pct
    // rates in exact integer arithmetic, hash-split apply
    // temperature-T=2 epoch schedule: sqrt is IEEE-correctly-rounded
    // in both engines, floor() makes it a safe integer weight; all
    // downstream arithmetic is exact integer division
    "e_epoch_schedule" -> s"""WITH d AS (
  SELECT source,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              t -> len(t) > 0)) AS BIGINT) AS nt
  FROM documents
), bysrc AS (
  SELECT source, CAST(sum(nt) AS BIGINT) AS src_tokens FROM d GROUP BY 1
), w AS (
  SELECT source, src_tokens,
         CAST(floor(sqrt(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS w
  FROM bysrc
), tot AS (SELECT CAST(sum(w) AS BIGINT) AS w_tot FROM w)
SELECT source, src_tokens, w,
       w * 1000000 // w_tot AS share_e6,
       (100000 * w) // w_tot AS draw_tokens,
       CASE WHEN src_tokens > 0
            THEN ((100000 * w) // w_tot) * 10000 // src_tokens
            ELSE 0 END AS epochs_e4,
       (CASE WHEN src_tokens > 0
             THEN ((100000 * w) // w_tot) * 10000 // src_tokens
             ELSE 0 END) > 40000 AS over_cap
FROM w CROSS JOIN tot""",

    "e_mix_apply" -> s"""WITH d AS (
  SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              t -> len(t) > 0)) AS BIGINT) AS nt
  FROM documents
), bysrc AS (
  SELECT source, CAST(sum(nt) AS BIGINT) AS src_tokens FROM d GROUP BY 1
), corpus AS (
  SELECT CAST(sum(src_tokens) AS BIGINT) AS corpus_tokens,
         count(*) AS n_sources FROM bysrc
), rates AS (
  SELECT source, src_tokens,
         CASE WHEN src_tokens > 0
              THEN least(100, (corpus_tokens * 50) // (n_sources * src_tokens))
              ELSE 100 END AS rate_pct
  FROM bysrc CROSS JOIN corpus
), sampled AS (
  SELECT d.source, count(*) AS n_sampled, CAST(sum(d.nt) AS BIGINT) AS sampled_tokens
  FROM d JOIN rates r ON r.source = d.source
  WHERE ${dh("d.source || '|' || CAST(d.doc_id AS VARCHAR)")} % 100 < r.rate_pct
  GROUP BY 1
)
SELECT r.source, r.src_tokens, r.rate_pct,
       coalesce(s.n_sampled, 0) AS n_sampled,
       coalesce(s.sampled_tokens, 0) AS sampled_tokens
FROM rates r LEFT JOIN sampled s ON s.source = r.source""",

    // one BPE training round: corpus-wide adjacent-char-pair counts
    // inside tokens, top-20 (ties on the pair string)
    "t_bpe_merges" -> s"""$TOKS, t AS (
  SELECT unnest(tk) AS tok FROM toks
), p AS (
  -- length(), not strlen(): positions are CHAR-based like the engine's
  -- length()/substr pair, so multi-byte tokens pair identically
  SELECT unnest(list_transform(range(1, length(tok)),
                i -> substr(tok, CAST(i AS INT), 2))) AS pair
  FROM t
)
SELECT pair, count(*) AS n FROM p
GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""",

    // BPE ENCODE, per doc: the engine's nested-fold segmentation is
    // replayed here as a recursive CTE over merge ROUNDS (rank order)
    // whose transition is a list_reduce greedy left-to-right merge
    // pass over the chr(31)-separated symbol string (fixture text is
    // control-char-free, so the separator cannot collide) — the
    // s_embed_pc1 bounded-iteration pattern. Segmentation runs on the
    // DISTINCT token vocabulary and joins back, like the engine.
    "t_bpe_encode" -> s"""$BPE
SELECT p.doc_id, CAST(sum(p.cnt) AS BIGINT) AS n_tok,
       CAST(sum(length(p.tok) * p.cnt) AS BIGINT) AS n_chars,
       CAST(sum(e.n_sub * p.cnt) AS BIGINT) AS n_sub
FROM pc p JOIN enc e ON e.tok = p.tok
GROUP BY 1""",

    // top-30 subword vocabulary after encode — pins the segmentation
    // STRINGS, not just counts
    "t_bpe_subwords" -> s"""$BPE, tc AS (
  SELECT tok, count(*) AS cnt FROM tkc GROUP BY 1
)
SELECT sub, CAST(sum(cnt) AS BIGINT) AS n FROM (
  SELECT unnest(e.subs) AS sub, t.cnt
  FROM tc t JOIN enc e ON e.tok = t.tok)
GROUP BY 1 ORDER BY n DESC, sub LIMIT 30""",

    // sequence packing on encoded subword counts — naive global-window
    // cumsum vs the engine's two-phase distributed form
    "t_pack_bpe" -> s"""$BPE, sized AS (
  SELECT p.doc_id, CAST(sum(e.n_sub * p.cnt) AS BIGINT) AS n_tok
  FROM pc p JOIN enc e ON e.tok = p.tok GROUP BY 1
)
SELECT doc_id, n_tok, tok_start, tok_start // 2048 AS chunk_id FROM (
  SELECT doc_id, n_tok,
         CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS tok_start
  FROM sized)""",

    // content-defined chunking: token i ends a chunk when its hash is
    // 0 mod 16; tail tokens after the last boundary form a final chunk
    "t_cdc_chunks" -> s"""$TOKS, b AS (
  SELECT doc_id, len(tk) AS n,
         list_filter(range(1, len(tk) + 1), i -> ${dh("tk[i]")} % 16 = 0) AS bpos
  FROM toks
), e AS (
  SELECT doc_id, n,
         CASE WHEN n = 0 THEN bpos
              WHEN len(bpos) > 0 AND bpos[-1] = n THEN bpos
              ELSE list_append(bpos, n) END AS ends
  FROM b
)
SELECT doc_id, CAST(len(ends) AS BIGINT) AS n_chunks,
       CAST(coalesce(list_max(list_transform(range(1, len(ends) + 1),
         i -> ends[i] - CASE WHEN i = 1 THEN 0 ELSE ends[i-1] END)), 0) AS BIGINT)
         AS max_chunk_tokens
FROM e""",

    // declared-vs-detected language agreement per declared tag
    "t_lang_agreement" -> s"""$TOKS, pred AS (
  SELECT doc_id, lang,
    CASE WHEN zh > 0 THEN 'zh'
         WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         WHEN s_de >= s_fr THEN 'de'
         ELSE 'fr' END AS pred_lang
  FROM (SELECT doc_id, lang,
          len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS zh,
          len(list_filter(tk, t -> t IN ('the','and','of','to','is','in','a'))) AS s_en,
          len(list_filter(tk, t -> t IN ('el','la','de','que','y','los','es'))) AS s_es,
          len(list_filter(tk, t -> t IN ('der','die','und','das','ist','nicht'))) AS s_de,
          len(list_filter(tk, t -> t IN ('le','les','et','des','un','une','est'))) AS s_fr
        FROM toks))
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       round(CAST(sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS agree_rate
FROM pred GROUP BY 1""",

    // per-source curation report over the same gate as t_quality_filter
    "e_source_report" -> s"""WITH tok2 AS (
  SELECT doc_id, source, lang, n_chars, text,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(tk)) AS BIGINT) AS total_tokens,
       round(avg(round($QUALITY, 4)), 4) AS avg_quality,
       CAST(sum(len(regexp_extract_all(text, '${graft.ext.TextOps.EmailPat}'))
              + len(regexp_extract_all(text, '${graft.ext.TextOps.UrlPat}'))) AS BIGINT) AS n_redactions,
       CAST(sum(CASE WHEN round($QUALITY, 4) >= 0.5 AND len(tk) BETWEEN 10 AND 200
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       count(DISTINCT lang) AS n_langs
FROM tok2
GROUP BY 1""",

    // the composed decontamination report: exact-normalized, 5-gram,
    // and near-dup train contamination counted per eval doc
    "e_decontam_report" -> s"""$LSH_PAIRS, marks AS (
  SELECT doc_id, ${dh("lang || '|' || CAST(doc_id AS VARCHAR)")} % 100 < 20 AS is_eval
  FROM documents
), nk AS (
  SELECT doc_id, ${dh("regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")} AS k
  FROM documents
), ex AS (
  SELECT e.doc_id AS eval_doc, count(*) AS n_exact
  FROM nk e JOIN marks me ON me.doc_id = e.doc_id AND me.is_eval
  JOIN nk t ON t.k = e.k
  JOIN marks mt ON mt.doc_id = t.doc_id AND NOT mt.is_eval
  GROUP BY 1
), sh5 AS (
  SELECT doc_id, unnest(list_distinct(${shinglesN(5)})) AS s FROM toks
), h5 AS (SELECT doc_id, ${dh("s")} AS h FROM sh5
), ng AS (
  SELECT e.doc_id AS eval_doc, count(DISTINCT t.doc_id) AS n_ngram
  FROM h5 t JOIN marks mt ON mt.doc_id = t.doc_id AND NOT mt.is_eval
  JOIN h5 e ON e.h = t.h
  JOIN marks me ON me.doc_id = e.doc_id AND me.is_eval
  GROUP BY 1
), nd AS (
  SELECT CASE WHEN ma.is_eval THEN doc_a ELSE doc_b END AS eval_doc,
         count(*) AS n_neardup
  FROM pairs
  JOIN marks ma ON ma.doc_id = doc_a
  JOIN marks mb ON mb.doc_id = doc_b
  WHERE ma.is_eval <> mb.is_eval GROUP BY 1)
SELECT m.doc_id AS eval_doc,
       CAST(coalesce(ex.n_exact, 0) AS BIGINT) AS n_exact,
       CAST(coalesce(ng.n_ngram, 0) AS BIGINT) AS n_ngram,
       CAST(coalesce(nd.n_neardup, 0) AS BIGINT) AS n_neardup
FROM marks m
LEFT JOIN ex ON ex.eval_doc = m.doc_id
LEFT JOIN ng ON ng.eval_doc = m.doc_id
LEFT JOIN nd ON nd.eval_doc = m.doc_id
WHERE m.is_eval""",

    // media → embedding → ANN: the stub featurizer recomputed from hex
    // bytes — counts and the final divide in FLOAT (binary32 division
    // is exactly rounded, so it matches the JVM's float math bit for
    // bit), widened to DOUBLE only for the cosine, like the engine
    "e_media_ann" -> """WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
  FROM documents
), bl AS (
  SELECT doc_id, n,
    list_transform(range(0, n), i ->
      ((strpos('0123456789ABCDEF', h[2*i+1]) - 1) * 16 +
       (strpos('0123456789ABCDEF', h[2*i+2]) - 1)) % 64) AS bins
  FROM hx
), fv AS (
  SELECT doc_id AS vec_id,
    list_transform(list_transform(range(0, 64), b ->
      CAST(len(list_filter(bins, x -> x = b)) AS FLOAT) / CAST(greatest(n, 1) AS FLOAT)),
      x -> CAST(x AS DOUBLE)) AS v
  FROM bl
), nv AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM fv
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nv WHERE vec_id < 8
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN nv ON vec_id >= 8)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3""",

    // media near-dup: 64-bit byte-window SimHash of the payload →
    // EXHAUSTIVE hamming pairs — the engine's pigeonhole banding must
    // lose nothing
    "m_media_neardup" -> s"""$MEDIA_FPS
SELECT doc_a, doc_b, hamming FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM fps a JOIN fps b ON a.doc_id < b.doc_id)
WHERE hamming <= 8""",

    // media near-dup APPLY: transitive closure over the SimHash pair
    // graph, keeper = min-id per component; sub-4-byte assets never
    // fingerprint and survive as singletons
    "m_media_apply" -> s"""${MEDIA_FPS.replaceFirst("WITH ", "WITH RECURSIVE ")}, mpairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fps a JOIN fps b ON a.doc_id < b.doc_id)
  WHERE hamming <= 8
), e AS (
  SELECT doc_a AS a, doc_b AS b FROM mpairs
  UNION ALL SELECT doc_b AS a, doc_a AS b FROM mpairs
), reach AS (
  SELECT doc_id AS doc, doc_id AS lbl FROM documents
  UNION
  SELECT e.b AS doc, r.lbl AS lbl FROM reach r JOIN e ON e.a = r.doc
), keep AS (
  SELECT doc AS doc_id FROM reach GROUP BY doc HAVING min(lbl) = doc)
SELECT d.doc_id AS asset_id, d.source, d.n_chars
FROM documents d JOIN keep USING (doc_id)""",

    // chunk → token-hash-histogram featurize → ANN: the t_chunk window
    // slices re-derived, 64-bin hashing-trick vector per chunk, exact
    // double division (counts are exact in both engines)
    "e_chunk_ann" -> s"""$TOKS, d AS (
  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok FROM toks WHERE len(tk) > 0
), ex AS (
  SELECT doc_id, tk, unnest(range(0, CAST((n_tok + 47) // 48 AS BIGINT))) AS i FROM d
), ctk AS (
  SELECT doc_id * 1000 + i AS vec_id, tk[i*48+1 : i*48+64] AS ct FROM ex WHERE i < 1000
), bl AS (
  SELECT vec_id, len(ct) AS n, list_transform(ct, t -> ${dh("t")} % 64) AS bins FROM ctk
), fv AS (
  SELECT vec_id, list_transform(range(0, 64), b ->
    CAST(len(list_filter(bins, x -> x = b)) AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE)) AS v
  FROM bl
), nv AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM fv
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nv WHERE vec_id < 8000
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN nv ON vec_id >= 8000)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3""",

    // edit-distance verify over the SAME LSH candidate cells as
    // d_lsh_jaccard; levenshtein is char-based in both engines
    "d_edit_verify" -> s"""$LSH_CANDS
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
       round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) /
             greatest(length(a.text), length(b.text)), 4) AS edit_sim
FROM cands c
JOIN documents a ON a.doc_id = c.doc_a
JOIN documents b ON b.doc_id = c.doc_b
WHERE round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) /
      greatest(length(a.text), length(b.text)), 4) >= 0.2""",

    // per-source 3-gram type/token ratio; too-short docs contribute no
    // gram rows on either side (empty-list unnest / null-array explode)
    "t_ngram_diversity" -> s"""WITH toks AS (
  SELECT source,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
), g AS (
  SELECT source, unnest(${shinglesN(3)}) AS g FROM toks)
SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
       round(CAST(count(DISTINCT g) AS DOUBLE) / count(*), 4) AS diversity
FROM g GROUP BY source""",

    // winnowing (rightmost-min per w=4 window over 3-gram hashes);
    // DuckDB's list_indexof finds the FIRST match, so the reversed
    // window gives the rightmost original position — same rule as the
    // engine's array_position(reverse(win), minv)
    "t_winnow" -> s"""$WINNOW SELECT doc_id, pos, fp FROM wfps""",

    // MOSS-style pair candidates: equi-join on the winnow fingerprint
    // value, >= 3 shared fingerprints
    "d_winnow_pairs" -> s"""$WINNOW, u AS (
  SELECT DISTINCT doc_id, fp FROM wfps)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_fps
FROM u a JOIN u b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 3""",

    // per-source unigram KL vs the corpus marginal; counts stay exact
    // integers, doubles only in the final log terms (ln == Spark log)
    "t_source_kl" -> s"""WITH occ AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS t
  FROM documents
), st AS (SELECT source, t, count(*) AS c_st FROM occ GROUP BY 1, 2),
ns AS (SELECT source, sum(c_st) AS n_s FROM st GROUP BY 1),
ct AS (SELECT t, sum(c_st) AS c_t FROM st GROUP BY 1),
tot AS (SELECT sum(n_s) AS n_tot FROM ns)
SELECT source, CAST(n_s AS BIGINT) AS n_tok,
       round(sum((CAST(c_st AS DOUBLE) / n_s) *
                 ln((CAST(c_st AS DOUBLE) / n_s) / (CAST(c_t AS DOUBLE) / n_tot))), 4) AS kl
FROM st JOIN ct USING (t) JOIN ns USING (source) CROSS JOIN tot
GROUP BY source, n_s""",

    // DSIR hashed-bigram importance weights toward src0: per-doc
    // bucket counts -> two <=1024-row bucket models, add-one smoothed
    // over the bucket space -> per-doc sum of count-weighted
    // log-ratios. Counts exact until the log.
    "t_dsir_weights" -> s"""$DSIR_W SELECT doc_id, n_grams, log_w FROM w""",

    // DSIR resample-apply: Efraimidis-Spirakis over exp(log_w), ranked
    // in LOG space (ln(u)/weight — the monotone transform of u^(1/w))
    // so the 1e-20..1e2 weight range cannot underflow the key; the key
    // itself is not output (its ~1e19 magnitude would expose ulp noise
    // the selection itself is immune to)
    "e_dsir_apply" -> s"""$DSIR_W, k AS (
  SELECT doc_id, log_w,
         ln((CAST(${dh("CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5) / 1000000.0)
           / exp(log_w) AS es_key
  FROM w)
SELECT doc_id, log_w FROM k ORDER BY es_key DESC, doc_id LIMIT 100""",

    // multi-target DSIR: one (doc, source, bucket) substrate, one
    // per-target bucket model (membership = source equality), scoring
    // join fans each bucket row by the target list — mirror of
    // TextOps.dsirWeightsMulti with IDENTICAL smoothing to DSIR_W
    "t_dsir_multi" -> s"""$DSIR_MULTI_W
SELECT doc_id, target, n_grams, log_w FROM w""",

    // composite-predicate targets: one target is (source AND lang),
    // the other a bare lang slice — the weights chain is
    // predicate-generic, not a source-column special case
    "e_dsir_cross" -> s"""${dsirCrossW(Seq(
      "src0_en" -> "source = 'src0' AND lang = 'en'",
      "zh" -> "lang = 'zh'"))}
SELECT doc_id, target, n_grams, log_w FROM w""",

    // per-target equalized calibration: e_dsir_calibrate composed
    // with the multi-target weights — per-target min/max strata,
    // 10 integer-hash draws per (target, stratum)
    "e_dsir_multi_calibrate" -> s"""$DSIR_MULTI_W, st AS (
  SELECT target, min(log_w) AS mn, max(log_w) AS mx FROM w GROUP BY 1
), strat AS (
  SELECT w.target, doc_id, log_w,
         CASE WHEN mx > mn
              THEN least(7, CAST(floor(((log_w - mn) * 8.0) / (mx - mn)) AS BIGINT))
              ELSE 0 END AS stratum
  FROM w JOIN st ON st.target = w.target
)
SELECT target, stratum, CAST(rk AS INT) AS rk, doc_id, log_w FROM (
  SELECT target, stratum, doc_id, log_w,
         row_number() OVER (PARTITION BY target, stratum
           ORDER BY ${dh("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
  FROM strat)
WHERE rk <= 10""",

    // multi-target ES resample: per-target top-50 by (ln u)/exp(log_w)
    // over the K=3 weight table; the key is never emitted (ulp)
    "e_dsir_multi_apply" -> s"""${dsirMultiW(Seq("src0", "src1", "src2"))}, k AS (
  SELECT target, doc_id, log_w,
         ln((CAST(${dh("CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5) / 1000000.0)
           / exp(log_w) AS es_key
  FROM w)
SELECT target, doc_id, log_w FROM (
  SELECT target, doc_id, log_w,
         row_number() OVER (PARTITION BY target ORDER BY es_key DESC, doc_id) AS rk
  FROM k) WHERE rk <= 50""",

    // multi-tenant curation DAG: NEAR-dup component keepers (the
    // d_neardup_apply closure) -> K=3 DSIR weights over the KEPT
    // corpus -> per-target ES top-50 (the dedup-first production
    // ordering: the LM contrast model never sees duplicate mass)
    "e_multi_curation" -> s"""${LSH_PAIRS.replaceFirst("WITH ", "WITH RECURSIVE ")}, e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs
), reach AS (
  SELECT doc_id AS doc, doc_id AS lbl FROM documents
  UNION
  SELECT e.b AS doc, r.lbl AS lbl FROM reach r JOIN e ON e.a = r.doc
), keep AS (
  SELECT doc AS doc_id FROM reach GROUP BY doc HAVING min(lbl) = doc
), kept AS (
  SELECT d.doc_id, d.source, d.text FROM documents d JOIN keep USING (doc_id)
), ${dsirMultiW(Seq("src0", "src1", "src2"), "kept").stripPrefix("WITH ")}, k AS (
  SELECT target, doc_id, log_w,
         ln((CAST(${dh("CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5) / 1000000.0)
           / exp(log_w) AS es_key
  FROM w)
SELECT target, doc_id, log_w FROM (
  SELECT target, doc_id, log_w,
         row_number() OVER (PARTITION BY target ORDER BY es_key DESC, doc_id) AS rk
  FROM k) WHERE rk <= 50""",

    // the FULL curation DAG: decontam (drop train docs near-dupping
    // across the 20% eval split) -> near-dup keepers over the
    // surviving train corpus (pair graph = the shared LSH pairs
    // restricted to train x train) -> K=3 DSIR over the kept corpus
    // -> per-target ES top-50
    "e_decontam_curation" -> s"""${LSH_PAIRS.replaceFirst("WITH ", "WITH RECURSIVE ")}, marks AS (
  SELECT doc_id, ${dh("lang || '|' || CAST(doc_id AS VARCHAR)")} % 100 < 20 AS is_eval
  FROM documents
), bad AS (
  SELECT DISTINCT CASE WHEN ma.is_eval THEN doc_b ELSE doc_a END AS doc_id
  FROM pairs
  JOIN marks ma ON ma.doc_id = doc_a
  JOIN marks mb ON mb.doc_id = doc_b
  WHERE ma.is_eval <> mb.is_eval
), train AS (
  SELECT d.* FROM documents d
  JOIN marks m USING (doc_id)
  WHERE NOT m.is_eval AND d.doc_id NOT IN (SELECT doc_id FROM bad)
), tp AS (
  SELECT doc_a, doc_b FROM pairs
  WHERE doc_a IN (SELECT doc_id FROM train) AND doc_b IN (SELECT doc_id FROM train)
), e AS (
  SELECT doc_a AS a, doc_b AS b FROM tp
  UNION ALL SELECT doc_b AS a, doc_a AS b FROM tp
), reach AS (
  SELECT doc_id AS doc, doc_id AS lbl FROM train
  UNION
  SELECT e.b AS doc, r.lbl AS lbl FROM reach r JOIN e ON e.a = r.doc
), keep AS (
  SELECT doc AS doc_id FROM reach GROUP BY doc HAVING min(lbl) = doc
), kept AS (
  SELECT d.doc_id, d.source, d.text FROM train d JOIN keep USING (doc_id)
), ${dsirMultiW(Seq("src0", "src1", "src2"), "kept").stripPrefix("WITH ")}, k AS (
  SELECT target, doc_id, log_w,
         ln((CAST(${dh("CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5) / 1000000.0)
           / exp(log_w) AS es_key
  FROM w)
SELECT target, doc_id, log_w FROM (
  SELECT target, doc_id, log_w,
         row_number() OVER (PARTITION BY target ORDER BY es_key DESC, doc_id) AS rk
  FROM k) WHERE rk <= 50""",

    // the K=3 slice: same chain, three targets in one pass
    "e_dsir_multi3" -> s"""${dsirMultiW(Seq("src0", "src1", "src2"))}, st AS (
  SELECT target, min(log_w) AS mn, max(log_w) AS mx FROM w GROUP BY 1
), strat AS (
  SELECT w.target, doc_id, log_w,
         CASE WHEN mx > mn
              THEN least(7, CAST(floor(((log_w - mn) * 8.0) / (mx - mn)) AS BIGINT))
              ELSE 0 END AS stratum
  FROM w JOIN st ON st.target = w.target
)
SELECT target, stratum, CAST(rk AS INT) AS rk, doc_id, log_w FROM (
  SELECT target, stratum, doc_id, log_w,
         row_number() OVER (PARTITION BY target, stratum
           ORDER BY ${dh("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
  FROM strat)
WHERE rk <= 10""",

    // equalized-sample DSIR calibration: 8 fixed-width strata over the
    // 4-dp-rounded log_w range (edges from one stats row, no quantile
    // sort), 20 uniform draws per stratum ranked on the integer
    // portable hash — no libm term anywhere near the rank boundary
    "e_dsir_calibrate" -> s"""$DSIR_W, st AS (
  SELECT min(log_w) AS mn, max(log_w) AS mx FROM w
), strat AS (
  SELECT doc_id, log_w,
         CASE WHEN mx > mn
              THEN least(7, CAST(floor(((log_w - mn) * 8.0) / (mx - mn)) AS BIGINT))
              ELSE 0 END AS stratum
  FROM w CROSS JOIN st
)
SELECT stratum, CAST(rk AS INT) AS rk, doc_id, log_w FROM (
  SELECT stratum, doc_id, log_w,
         row_number() OVER (PARTITION BY stratum
           ORDER BY ${dh("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
  FROM strat)
WHERE rk <= 20""",

    // binary-payload dedup ledger: md5 of the asset bytes (DuckDB's
    // md5(VARCHAR) digests the same UTF-8 bytes the engine's
    // md5(text-as-binary) does; this build has no md5(BLOB) overload)
    "m_payload_dedup" -> """SELECT md5(text) AS payload_md5,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keeper
FROM documents GROUP BY 1, 2""",

    // linear-head classifier sweep: literal weights, one dot+sigmoid
    // per row (weights regenerated from SparkEntry.ModelWeights)
    "s_model_score" -> s"""SELECT vec_id,
  round(1.0 / (1.0 + exp(-(list_dot_product(
    list_transform(embedding, x -> CAST(x AS DOUBLE)),
    [${graft.SparkEntry.ModelWeights.mkString(", ")}]) + 0.1))), 4) AS p
FROM embeddings""",

    // ANN against an external store: codebook and cells from the
    // store (vec_id >= 8) only; the first 8 vectors probe as
    // non-member queries
    "s_ann_store" -> s"""$VECS, store AS (
  SELECT vec_id, v, nrm FROM nv WHERE vec_id >= 8
), cents AS (
  SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM store
  ORDER BY ${dh("CAST(vec_id AS VARCHAR)")}, vec_id LIMIT 8
), asg AS (
  SELECT vec_id, v, nrm, c_id AS cell FROM (
    SELECT s.vec_id, s.v, s.nrm, c.c_id,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY list_dot_product(s.v, c.cv) / (s.nrm * c.cn) DESC, c.c_id) AS crnk
    FROM store s, cents c) WHERE crnk = 1
), q AS (
  SELECT vec_id AS q_id, qv, qn, c_id AS q_cell FROM (
    SELECT nv.vec_id, nv.v AS qv, nv.nrm AS qn, c.c_id,
           row_number() OVER (PARTITION BY nv.vec_id
             ORDER BY list_dot_product(nv.v, c.cv) / (nv.nrm * c.cn) DESC, c.c_id) AS crnk
    FROM nv, cents c WHERE nv.vec_id < 8) WHERE crnk = 1
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN asg ON q_cell = cell)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3""",

    // nearest-centroid classification: per-vector argmax over the
    // k-row centroid frame (tie -> smaller label), rolled up to a
    // per-label accuracy report
    "s_centroid_classify" -> s"""WITH vecs AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), cent AS (
  SELECT label AS c_label, $CENT_ARR AS c FROM vecs GROUP BY label
), scored AS (
  SELECT vec_id, label, c_label,
         list_dot_product(v, c) /
           (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c))) AS cos
  FROM vecs CROSS JOIN cent
), p AS (
  SELECT vec_id, label, c_label AS pred FROM (
    SELECT vec_id, label, c_label,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_label) AS rnk
    FROM scored)
  WHERE rnk = 1)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       round(CAST(sum(CASE WHEN pred = label THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS accuracy
FROM p GROUP BY label""",

    // pairwise centroid cosine — the k x k inter-class affinity matrix
    "s_label_affinity" -> s"""WITH vecs AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), cent AS (
  SELECT label, $CENT_ARR AS c FROM vecs GROUP BY label)
SELECT a.label AS label_a, b.label AS label_b,
       round(list_dot_product(a.c, b.c) /
             (sqrt(list_dot_product(a.c, a.c)) * sqrt(list_dot_product(b.c, b.c))), 4) AS cos
FROM cent a JOIN cent b ON a.label < b.label""",

    // per-modality census over the synthetic doc_id%3 typing
    "m_modality_report" -> """SELECT
  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
  CAST(count(*) AS BIGINT) AS n_assets,
  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  round(avg(octet_length(encode(text))), 4) AS avg_bytes,
  CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents GROUP BY 1""",

    // embedding outliers: cosine to own-label centroid (the exact
    // fixed-point centroid of s_label_centroids), standardized within
    // the label over ROUNDED cosines, flagged on the ROUNDED z so the
    // comparison itself can't flake cross-engine
    "s_embed_outliers" -> s"""WITH vecs AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), cent AS (
  SELECT label, $CENT_ARR AS c FROM vecs GROUP BY label
), scored AS (
  SELECT vec_id, vecs.label AS label,
         round(list_dot_product(v, c) /
               (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c))), 4) AS cos
  FROM vecs JOIN cent USING (label)
), stats AS (
  SELECT label, avg(cos) AS mu, stddev_pop(cos) AS sigma FROM scored GROUP BY label)
SELECT vec_id, label, cos, round((cos - mu) / sigma, 4) AS z
FROM scored JOIN stats USING (label)
WHERE round((cos - mu) / sigma, 4) <= -2.0""",

    // exact fixed-point Gram matrix (X^T X, upper triangle, 1e3
    // scale): the oracle is the exploded i×j cross-join formulation —
    // same exact integer sums the engine's one-buffer imperative
    // aggregate (GramMatrixFixed) accumulates without per-pair rows
    "s_embed_gram" -> """WITH vecs AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), idx AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS i
), pr AS (SELECT a.i AS i, b.i AS j FROM idx a JOIN idx b ON b.i >= a.i)
SELECT pr.i, pr.j,
       CAST(sum(CAST(round(v[pr.i+1]*1000.0) AS BIGINT) *
                CAST(round(v[pr.j+1]*1000.0) AS BIGINT)) AS BIGINT) AS gram_fx
FROM vecs CROSS JOIN pr
GROUP BY 1, 2""",

    // first principal direction: the oracle replays the engine's 20
    // fixed power-iteration steps (normalize each step, start
    // (0.125)^64) over the SAME exact integer gram in a recursive
    // CTE — per-step float noise is ~1e-15, far inside round-4
    "s_embed_pc1" -> """WITH RECURSIVE gram AS (
  WITH vecs AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
  idx AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS i),
  pr AS (SELECT a.i AS i, b.i AS j FROM idx a, idx b)
  SELECT pr.i, pr.j,
         CAST(sum(CAST(round(v[pr.i+1]*1000.0) AS BIGINT) *
                  CAST(round(v[pr.j+1]*1000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS g
  FROM vecs CROSS JOIN pr GROUP BY 1, 2
), it AS (
  -- CAST: a bare 0.125 is DECIMAL in DuckDB and would quantize the
  -- whole iteration to 3 fractional digits
  SELECT 0 AS t, list_transform(range(0, 64), x -> CAST(0.125 AS DOUBLE)) AS v
  UNION ALL
  SELECT t+1, (
    SELECT list(mv / sqrt(nrm2) ORDER BY i) FROM (
      SELECT i, mv, sum(mv*mv) OVER () AS nrm2 FROM (
        SELECT g.i AS i, sum(g.g * it.v[g.j+1]) AS mv FROM gram g GROUP BY g.i)))
  FROM it WHERE t < 20
)
SELECT CAST(unnest(range(0, 64)) AS INT) AS i,
       round(v[unnest(range(0, 64))+1], 4) AS loading
FROM it WHERE t = 20""",

    // ridge linear probe: replay the engine's 60 damped-Jacobi sweeps
    // on (G + λI)w = b from the SAME exact integer moments; ω derives
    // from the matrix itself (1 / max row-ratio), associativity of the
    // update mirrors Ridge.jacobiSweeps verbatim
    "s_ridge_fit" -> s"""$RIDGE_IT
SELECT CAST(unnest(range(0, 64)) AS INT) AS i,
       round(w[unnest(range(0, 64))+1], 4) AS weight
FROM it WHERE t = 60""",

    // the trained probe scored back over the corpus: round-4 weights
    // (the SAME emission s_ridge_fit pins) dotted with each vector
    "s_ridge_score" -> s"""$RIDGE_IT, w4 AS (
  SELECT list(round(w[i.i+1], 4) ORDER BY i.i) AS w4
  FROM it CROSS JOIN (SELECT CAST(unnest(range(0, 64)) AS INT) AS i) i
  WHERE t = 60
)
SELECT vec_id, CAST(label AS BIGINT) AS label,
       round(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), w4), 4) AS yhat
FROM embeddings CROSS JOIN w4""",

    // z-order layout audit: exact integer Morton codes, equal-COUNT
    // files cut by row_number over the z order (unique tiebreak) —
    // bit-for-bit with the engine
    "p_zorder_hist" -> s"""WITH zf AS (
  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
         ${zmorton("l_partkey", "l_suppkey")} AS z FROM lineitem
), n AS (SELECT count(*) AS n_total FROM zf),
rk AS (
  SELECT l_partkey, l_suppkey,
         row_number() OVER (ORDER BY z, l_orderkey, l_linenumber) AS rn, n_total
  FROM zf CROSS JOIN n)
SELECT ((rn - 1) * 64) // n_total AS bucket, count(*) AS n_rows,
       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
       min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
FROM rk GROUP BY 1""",

    // data-skipping effectiveness of three candidate sort layouts vs
    // a 2-D range predicate — integer arithmetic end to end
    "p_skipping_report" -> s"""WITH mx AS (
  SELECT max(l_partkey) AS max_pk, max(l_suppkey) AS max_sk,
         count(*) AS n_total
  FROM lineitem
), r AS (
  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, n_total,
         max_pk // 10 AS p_lo, max_pk // 5 AS p_hi,
         max_sk // 10 AS s_lo, max_sk // 5 AS s_hi,
         ${zmorton("l_partkey", "l_suppkey")} AS z
  FROM lineitem CROSS JOIN mx
), lb AS (
  SELECT 'zorder' AS layout, z AS skey, * FROM r
  UNION ALL
  SELECT 'partkey', l_partkey, * FROM r
  UNION ALL
  SELECT 'orderkey', l_orderkey, * FROM r
), rk AS (
  SELECT layout, l_partkey, l_suppkey, p_lo, p_hi, s_lo, s_hi,
         ((row_number() OVER (PARTITION BY layout
             ORDER BY skey, l_orderkey, l_linenumber) - 1) * 64) // n_total AS bucket
  FROM lb
), pb AS (
  SELECT layout, bucket, count(*) AS n,
         min(l_partkey) AS mn_p, max(l_partkey) AS mx_p,
         min(l_suppkey) AS mn_s, max(l_suppkey) AS mx_s,
         CAST(sum(CASE WHEN l_partkey BETWEEN p_lo AND p_hi
                        AND l_suppkey BETWEEN s_lo AND s_hi
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         CAST(sum(CASE WHEN l_suppkey BETWEEN s_lo AND s_hi
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_match_sk,
         min(p_lo) AS p_lo, min(p_hi) AS p_hi,
         min(s_lo) AS s_lo, min(s_hi) AS s_hi
  FROM rk GROUP BY 1, 2),
pv AS (
  SELECT layout, n, 'pk_and_sk' AS predicate,
         (mx_p < p_lo OR mn_p > p_hi OR mx_s < s_lo OR mn_s > s_hi) AS pruned,
         n_match AS matched
  FROM pb
  UNION ALL
  SELECT layout, n, 'sk_only',
         (mx_s < s_lo OR mn_s > s_hi), n_match_sk
  FROM pb)
SELECT layout, predicate, count(*) AS n_buckets,
       CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
       CAST(sum(CASE WHEN pruned THEN 0 ELSE n END) AS BIGINT) AS rows_scanned,
       CAST(sum(matched) AS BIGINT) AS rows_matched
FROM pv
GROUP BY 1, 2""",

    // the composed curation DAG: normalize -> exact-dedup keepers ->
    // quality/length gate -> train split -> pack into 2048-tok chunks
    "e_curation_pipeline" -> s"""WITH norm AS (
  SELECT doc_id, lang, text,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS ntext
  FROM documents
), grp AS (
  SELECT ${dh("ntext")} AS th, CAST(length(ntext) AS BIGINT) AS tl, min(doc_id) AS keeper
  FROM norm GROUP BY 1, 2
), kept AS (
  SELECT n.doc_id, n.lang, n.text FROM norm n JOIN grp g ON n.doc_id = g.keeper
), toks AS (
  SELECT doc_id, lang, text,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk
  FROM kept
), gated AS (
  SELECT doc_id, lang, round($QUALITY, 4) AS quality, CAST(len(tk) AS BIGINT) AS n_tok
  FROM toks
  WHERE round($QUALITY, 4) >= 0.5 AND len(tk) BETWEEN 10 AND 200
    AND NOT (${dh("lang || '|' || CAST(doc_id AS VARCHAR)")} % 100 < 20)
)
SELECT doc_id, lang, quality, n_tok, tok_start, tok_start // 2048 AS chunk_id FROM (
  SELECT *, CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS tok_start
  FROM gated)""",

    // the ALL-gates composition: intra-doc repeated-span removal
    // (the t_repetition_apply chain) -> exact-dedup keepers on the
    // normalized REBUILT text -> quality/length gate scored on the
    // rebuilt text -> CCNet perplexity gate under the corpus bigram LM
    // (per-lang quantile_cont median, the e_ppl_filter chain) ->
    // eval-split holdout. rt carries (text, tk) of the REBUILT doc so
    // the shared QUALITY fragment scores the cleaned form; the xent
    // chain scores the ORIGINAL corpus (the LM substrate is corpus-
    // level, not per-stage)
    "e_curation_full" -> s"""$CurationGatesCtes
SELECT doc_id, lang, quality, n_kept, xent_nats FROM held""",

    // per-stage yield funnel over the same gate CTEs — the observable
    // twin of the kept corpus
    "e_curation_funnel" -> s"""$CurationGatesCtes
SELECT CAST(0 AS BIGINT) AS stage_idx, 'corpus' AS stage, count(*) AS n_docs FROM documents
UNION ALL SELECT CAST(1 AS BIGINT), 'exact_dedup', count(*) FROM kd
UNION ALL SELECT CAST(2 AS BIGINT), 'quality_gate', count(*) FROM gated
UNION ALL SELECT CAST(3 AS BIGINT), 'ppl_gate', count(*) FROM pplkept
UNION ALL SELECT CAST(4 AS BIGINT), 'train_holdout', count(*) FROM held""",

    "d_exact" -> s"""SELECT ${dh("text")} AS text_hash,
  CAST(length(text) AS BIGINT) AS text_len,
  count(*) AS n_copies, min(doc_id) AS keeper
FROM documents GROUP BY 1, 2""",

    "d_exact_normalized" -> s"""WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS text FROM documents)
SELECT ${dh("text")} AS text_hash,
  CAST(length(text) AS BIGINT) AS text_len,
  count(*) AS n_copies, min(doc_id) AS keeper
FROM norm GROUP BY 1, 2""",

    "d_ngram_jaccard" -> s"""$SH, sz AS (
  SELECT doc_id, count(*) AS n_sh FROM h GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM h a JOIN h b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5""",

    "d_ngram_jaccard_capped" -> s"""$SH, hc AS (
  SELECT h FROM h GROUP BY h HAVING count(*) <= 5
), hf AS (
  SELECT h.doc_id, h.h FROM h JOIN hc USING (h)
), sz AS (
  SELECT doc_id, count(*) AS n_sh FROM hf GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM hf a JOIN hf b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5""",

    "d_minhash_sig" -> s"$SIG SELECT * FROM sig",

    "d_minhash_lsh" -> s"""$SIG, bands AS (
  ${(0 until 4).map(bandSelect).mkString("\n  UNION ALL ")})
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_shared_bands
FROM bands x JOIN bands y
  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
GROUP BY 1, 2""",

    "d_lsh_jaccard" -> s"$LSH_PAIRS SELECT doc_a, doc_b, jaccard FROM pairs",
    // the spark.sql twin (registered minhash_sketch aggregate + pure
    // built-ins) computes the identical pipeline through the parser
    "q_sql_lsh" -> s"$LSH_PAIRS SELECT doc_a, doc_b, jaccard FROM pairs",

    // one-row corpus overview; the quality mean sums fixed-point
    // per-doc scores so it is order-independent
    "e_corpus_report" -> s"""$TOKS, ts AS (
  SELECT count(*) AS n_tokens, count(DISTINCT t) AS vocab
  FROM (SELECT unnest(tk) AS t FROM toks)
), ds AS (
  SELECT count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
         count(*) - count(DISTINCT ${dh("text")}) AS n_dup_docs,
         CAST(sum(CAST(round(($QUALITY) * 10000) AS BIGINT)) AS BIGINT) AS q_fx
  FROM toks)
SELECT n_docs, n_langs, CAST(n_dup_docs AS BIGINT) AS n_dup_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens, vocab,
       round(CAST(q_fx AS DOUBLE) / n_docs / 10000.0, 4) AS avg_quality
FROM ds CROSS JOIN ts""",

    // near-dup pairs straddling the deterministic 20% holdout,
    // oriented train -> eval
    "e_split_leakage" -> s"""$LSH_PAIRS,
sp AS (
  SELECT doc_id,
         (${dh("lang || '|' || CAST(doc_id AS VARCHAR)")} % 100 < 20) AS is_eval
  FROM documents)
SELECT CASE WHEN a.is_eval THEN p.doc_b ELSE p.doc_a END AS train_doc,
       CASE WHEN a.is_eval THEN p.doc_a ELSE p.doc_b END AS eval_doc,
       p.jaccard
FROM pairs p
JOIN sp a ON a.doc_id = p.doc_a
JOIN sp b ON b.doc_id = p.doc_b
WHERE a.is_eval <> b.is_eval""",

    // engine: the FORCED distributed label-propagation sweep loop
    // (driverEdgeLimit = 0 — the 100 TB path of nearDupComponents);
    // oracle: the same recursive closure as d_neardup_groups. Pinning
    // both rows means the driver fast-path AND the iterative path are
    // each oracle-checked, not just whichever the fixture size picks.
    "d_cc_iterative" -> s"""${LSH_PAIRS.replaceFirst("WITH ", "WITH RECURSIVE ")}, e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs
), reach AS (
  SELECT doc_id AS doc, doc_id AS lbl FROM documents
  UNION
  SELECT e.b AS doc, r.lbl AS lbl FROM reach r JOIN e ON e.a = r.doc
)
SELECT doc AS doc_id, min(lbl) AS group_id FROM reach GROUP BY doc""",

    // fixed-boundary 16-token chunk ("paragraph") dedup report: the
    // duplicated chunks with their global first occurrence; okey =
    // doc_id·100000 + chunk_id linearizes the occurrence order
    "d_chunk_dedup" -> s"""$TOKS, ch AS (
  SELECT doc_id, tk, unnest(range(0, CAST((len(tk) + 15) // 16 AS BIGINT))) AS chunk_id
  FROM toks WHERE len(tk) > 0
), cr AS (
  SELECT doc_id, chunk_id, doc_id*100000 + chunk_id AS okey,
         array_to_string(tk[chunk_id*16+1 : chunk_id*16+16], ' ') AS chunk_text
  FROM ch
), g AS (
  SELECT ${dh("chunk_text")} AS h, count(*) AS n_copies,
         count(DISTINCT doc_id) AS n_docs, min(okey) AS keep_key
  FROM cr GROUP BY 1)
SELECT h AS chunk_hash, n_copies, CAST(n_docs AS BIGINT) AS n_docs,
       keep_key // 100000 AS keeper_doc, keep_key % 100000 AS keeper_chunk
FROM g WHERE n_copies > 1""",

    // chunk-dedup apply: duplicated chunks keep only the global first
    // occurrence; docs reassembled from surviving chunks in order
    "d_chunk_apply" -> s"""$TOKS, ch AS (
  SELECT doc_id, tk, unnest(range(0, CAST((len(tk) + 15) // 16 AS BIGINT))) AS chunk_id
  FROM toks WHERE len(tk) > 0
), cr AS (
  SELECT doc_id, chunk_id, doc_id*100000 + chunk_id AS okey,
         array_to_string(tk[chunk_id*16+1 : chunk_id*16+16], ' ') AS chunk_text
  FROM ch
), hr AS (SELECT *, ${dh("chunk_text")} AS h FROM cr
), g AS (SELECT h, min(okey) AS keep_key FROM hr GROUP BY h
), j AS (
  SELECT hr.doc_id, hr.chunk_id, hr.chunk_text, hr.okey = g.keep_key AS kept
  FROM hr JOIN g ON g.h = hr.h)
SELECT doc_id,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_id) FILTER (WHERE kept), '') AS text
FROM j GROUP BY doc_id""",

    // engine: iterative min-label propagation; oracle: recursive-CTE
    // transitive closure — independent algorithms, identical fixpoint
    "d_neardup_groups" -> s"""${LSH_PAIRS.replaceFirst("WITH ", "WITH RECURSIVE ")}, e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs
), reach AS (
  SELECT doc_id AS doc, doc_id AS lbl FROM documents
  UNION
  SELECT e.b AS doc, r.lbl AS lbl FROM reach r JOIN e ON e.a = r.doc
)
SELECT doc AS doc_id, min(lbl) AS group_id FROM reach GROUP BY doc""",

    // component-size histogram over the same closure: clusters per
    // size, documents they hold — the pre-apply dedup report
    "d_group_sizes" -> s"""${LSH_PAIRS.replaceFirst("WITH ", "WITH RECURSIVE ")}, e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs
), reach AS (
  SELECT doc_id AS doc, doc_id AS lbl FROM documents
  UNION
  SELECT e.b AS doc, r.lbl AS lbl FROM reach r JOIN e ON e.a = r.doc
), comp AS (SELECT doc, min(lbl) AS g FROM reach GROUP BY doc
), gsz AS (SELECT g, CAST(count(*) AS BIGINT) AS group_size FROM comp GROUP BY g)
SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(group_size) AS BIGINT) AS n_docs
FROM gsz GROUP BY 1""",

    // near-dup apply: keep each component's min-doc_id representative
    // (singletons keep themselves) — same closure as d_neardup_groups
    "d_neardup_apply" -> s"""${LSH_PAIRS.replaceFirst("WITH ", "WITH RECURSIVE ")}, e AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs
), reach AS (
  SELECT doc_id AS doc, doc_id AS lbl FROM documents
  UNION
  SELECT e.b AS doc, r.lbl AS lbl FROM reach r JOIN e ON e.a = r.doc
), keep AS (
  SELECT doc AS doc_id FROM reach GROUP BY doc HAVING min(lbl) = doc)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d JOIN keep USING (doc_id)""",

    // weighted PageRank over the symmetrized customer↔supplier
    // purchase graph — the oracle replays the engine's 5 exact
    // fixed-point power steps in a recursive CTE (all-long arithmetic;
    // `//` on non-negative longs = Spark `div`), the s_embed_pc1
    // bounded-iteration convention at graph scale
    "g_pagerank" -> """WITH RECURSIVE cs AS (
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
         's' || CAST(l.l_suppkey AS VARCHAR) AS snode, count(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT cnode AS src, snode AS dst, w FROM cs
  UNION ALL SELECT snode AS src, cnode AS dst, w FROM cs
), ow AS (SELECT src, sum(w) AS wout FROM e GROUP BY src
), pr AS (
  SELECT 0 AS t, src AS node, CAST(1000000 AS BIGINT) AS p FROM (SELECT DISTINCT src FROM e)
  UNION ALL
  SELECT t+1, dst AS node, CAST(150000 + (85 * s) // 100 AS BIGINT) AS p FROM (
    SELECT pr.t AS t, e.dst AS dst, sum((pr.p * e.w) // ow.wout) AS s
    FROM pr JOIN e ON e.src = pr.node JOIN ow ON ow.src = pr.node
    WHERE pr.t < 5 GROUP BY 1, 2)
)
SELECT node, p AS pr_fx FROM pr WHERE t = 5""",

    // label-propagation communities: replay the engine's 4 bounded
    // synchronous rounds; argmax-with-min-tie = first row of
    // (cnt DESC, label) per dst
    "g_communities" -> """WITH RECURSIVE cs AS (
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
         's' || CAST(l.l_suppkey AS VARCHAR) AS snode, count(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT cnode AS src, snode AS dst, w FROM cs
  UNION ALL SELECT snode AS src, cnode AS dst, w FROM cs
), lp AS (
  SELECT 0 AS t, node, node AS label FROM (
    SELECT DISTINCT src AS node FROM e
    UNION SELECT DISTINCT dst FROM e)
  UNION ALL
  SELECT t+1, dst AS node, label FROM (
    SELECT t, dst, label,
           row_number() OVER (PARTITION BY t, dst ORDER BY cnt DESC, label) AS rn
    FROM (
      SELECT lp.t AS t, e.dst AS dst, lp.label AS label, sum(e.w) AS cnt
      FROM lp JOIN e ON e.src = lp.node
      WHERE lp.t < 4 GROUP BY 1, 2, 3))
  WHERE rn = 1
)
SELECT node, label AS community FROM lp WHERE t = 4""",

    // per-user EWMA (α=1/2, bounded 16-row frame) in exact integer
    // arithmetic: frame values weighted 2^(16-L+i), one double
    // division at the end — list() over a window frame preserves
    // frame order in both engines
    "a_ewma" -> """WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CAST(round(value*1000) AS BIGINT) AS v_fx
  FROM events
), wv AS (
  SELECT user_id, event_id,
         list(v_fx) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS vals
  FROM ev)
SELECT user_id, event_id,
       round(CAST(list_sum(list_transform(range(0, len(vals)),
                    k -> vals[k+1] * (CAST(1 AS BIGINT) << (16 - len(vals) + k)))) AS DOUBLE)
             / ((CAST(1 AS BIGINT) << 16) - (CAST(1 AS BIGINT) << (16 - len(vals))))
             / 1000.0, 4) AS ewma
FROM wv""",

    // fastText-shaped hashed-bigram linear scorer: the weight vector
    // is minted from the bucket id's portable hash, so the oracle
    // derives the identical model with no side-channel
    "t_hash_score" -> s"""$TOKS, bg AS (
  SELECT doc_id, unnest(${shinglesN(2)}) AS bg FROM toks
), b AS (SELECT doc_id, ${dh("bg")} % 4096 AS b FROM bg
), wt AS (SELECT doc_id, (${dh("'w' || CAST(b AS VARCHAR)")} % 2001) - 1000 AS w_fx FROM b)
SELECT doc_id, count(*) AS n_feat, CAST(sum(w_fx) AS BIGINT) AS score_fx,
       CAST(round(CAST(sum(w_fx) AS DOUBLE) * 10.0 / count(*)) AS BIGINT) AS score_e4
FROM wt GROUP BY doc_id""",

    // personalized PageRank: same recursive fixed-point iterate as
    // g_pagerank, with initial mass and teleport restricted to the
    // supplier seed set (node LIKE 's%')
    "g_ppr_suppliers" -> """WITH RECURSIVE cs AS (
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
         's' || CAST(l.l_suppkey AS VARCHAR) AS snode, count(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT cnode AS src, snode AS dst, w FROM cs
  UNION ALL SELECT snode AS src, cnode AS dst, w FROM cs
), ow AS (SELECT src, sum(w) AS wout FROM e GROUP BY src
), pr AS (
  SELECT 0 AS t, src AS node,
         CAST(CASE WHEN src LIKE 's%' THEN 1000000 ELSE 0 END AS BIGINT) AS p
  FROM (SELECT DISTINCT src FROM e)
  UNION ALL
  SELECT t+1, dst AS node,
         CAST(CASE WHEN dst LIKE 's%' THEN 150000 ELSE 0 END + (85 * s) // 100 AS BIGINT) AS p
  FROM (
    SELECT pr.t AS t, e.dst AS dst, sum((pr.p * e.w) // ow.wout) AS s
    FROM pr JOIN e ON e.src = pr.node JOIN ow ON ow.src = pr.node
    WHERE pr.t < 5 GROUP BY 1, 2)
)
SELECT node, p AS pr_fx FROM pr WHERE t = 5""",

    // degree histogram of the symmetrized purchase graph
    "g_degree_hist" -> """WITH cs AS (
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
         's' || CAST(l.l_suppkey AS VARCHAR) AS snode, count(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT cnode AS src, snode AS dst, w FROM cs
  UNION ALL SELECT snode AS src, cnode AS dst, w FROM cs
), d AS (SELECT src, count(*) AS degree, sum(w) AS wdeg FROM e GROUP BY 1)
SELECT degree, count(*) AS n_nodes, CAST(sum(wdeg) AS BIGINT) AS sum_wdegree
FROM d GROUP BY 1""",

    // triangle count over the LSH near-dup pair graph; the oracle
    // orients by id (a<b<c), the engine by degree — identical count
    "g_triangles" -> s"""$LSH_PAIRS, ed AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs)
SELECT (SELECT count(*) FROM ed) AS n_edges,
       (SELECT count(*) FROM ed e1
        JOIN ed e2 ON e2.a = e1.b
        JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""",

    // bounded k-core peel (k=48, 3 rounds): the oracle replays the
    // engine's single-reference iterate verbatim — real edges carry
    // the source's aliveness into the degree sum, the zero-marked
    // self edge carries each vertex's own (alive, peeled) through the
    // aggregate, so the recursive table is referenced exactly once
    "g_kcore" -> """WITH RECURSIVE cs AS (
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
         's' || CAST(l.l_suppkey AS VARCHAR) AS snode
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT cnode AS src, snode AS dst FROM cs
  UNION ALL SELECT snode AS src, cnode AS dst FROM cs
), e2 AS (
  SELECT src, dst, 1 AS rl FROM e
  UNION ALL SELECT src AS src, src AS dst, 0 AS rl FROM (SELECT DISTINCT src FROM e)
), st AS (
  SELECT 0 AS t, src AS node, CAST(1 AS BIGINT) AS alive, CAST(0 AS BIGINT) AS peeled
  FROM (SELECT DISTINCT src FROM e)
  UNION ALL
  SELECT t + 1, dst AS node,
         CAST(CASE WHEN ca = 1 AND deg >= 48 THEN 1 ELSE 0 END AS BIGINT),
         CAST(CASE WHEN ca = 1 AND deg < 48 THEN t + 1 ELSE cp END AS BIGINT)
  FROM (
    SELECT st.t AS t, e2.dst AS dst,
           sum(CASE WHEN e2.rl = 1 THEN st.alive ELSE 0 END) AS deg,
           max(CASE WHEN e2.rl = 0 THEN st.alive END) AS ca,
           max(CASE WHEN e2.rl = 0 THEN st.peeled END) AS cp
    FROM st JOIN e2 ON e2.src = st.node
    WHERE st.t < 3 GROUP BY 1, 2)
)
SELECT node, alive AS in_core, peeled AS peeled_round FROM st WHERE t = 3""",

    // multi-source BFS from the nation-0 supplier seeds, depth 3 —
    // same single-reference iterate; NULL dist is "unreached" (NULL+1
    // = NULL and MIN ignores NULLs identically in both engines)
    "g_bfs" -> """WITH RECURSIVE cs AS (
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
         's' || CAST(l.l_suppkey AS VARCHAR) AS snode
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT cnode AS src, snode AS dst FROM cs
  UNION ALL SELECT snode AS src, cnode AS dst FROM cs
), e2 AS (
  SELECT src, dst, CAST(1 AS BIGINT) AS delta FROM e
  UNION ALL SELECT src AS src, src AS dst, CAST(0 AS BIGINT) AS delta
  FROM (SELECT DISTINCT src FROM e)
), sd AS (
  SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
  FROM supplier WHERE s_nationkey = 0
), st AS (
  SELECT 0 AS t, v.src AS node,
         CASE WHEN sd.node IS NOT NULL THEN CAST(0 AS BIGINT) END AS dist
  FROM (SELECT DISTINCT src FROM e) v LEFT JOIN sd ON sd.node = v.src
  UNION ALL
  SELECT t + 1, dst AS node, d AS dist FROM (
    SELECT st.t AS t, e2.dst AS dst, min(st.dist + e2.delta) AS d
    FROM st JOIN e2 ON e2.src = st.node
    WHERE st.t < 3 GROUP BY 1, 2)
)
SELECT node, dist FROM st WHERE t = 3""",

    // hour-of-day seasonality: per-(type, hour) mean and deviation
    // from the type's overall mean, all e4 fixed point — the
    // deviation is a LONG subtraction of already-rounded means
    "a_seasonality" -> """WITH ev AS (
  SELECT event_type, extract(hour FROM CAST(ts AS TIMESTAMP)) AS hr,
         CAST(round(value * 1000) AS BIGINT) AS v_fx
  FROM events
), hourly AS (
  SELECT event_type, hr, count(*) AS n, sum(v_fx) AS s_fx
  FROM ev GROUP BY 1, 2
), o AS (
  SELECT event_type,
         CAST(round(CAST(sum(s_fx) AS DOUBLE) * 10.0 / sum(n)) AS BIGINT) AS omean_e4
  FROM hourly GROUP BY 1
), m AS (
  SELECT h.event_type, CAST(hr AS BIGINT) AS hr, n,
         CAST(round(CAST(s_fx AS DOUBLE) * 10.0 / n) AS BIGINT) AS mean_e4, omean_e4
  FROM hourly h JOIN o ON o.event_type = h.event_type)
SELECT event_type, hr, n, mean_e4,
       CAST(mean_e4 - omean_e4 AS BIGINT) AS dev_e4 FROM m""",

    // per-source duplication report: exact-dup docs via full-text
    // hash multiplicity, near-dup docs via the shared LSH pair frame,
    // both as e4 fractions in exact long division
    "e_dup_by_source" -> s"""$LSH_PAIRS, exd AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           count(*) OVER (PARTITION BY ${dh("text")}, length(text)) AS n
    FROM documents)
  WHERE n > 1
), nd AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs
    UNION ALL SELECT doc_b AS doc_id FROM pairs)
), agg AS (
  SELECT d.source, count(*) AS n_docs,
         CAST(sum(CASE WHEN exd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
         CAST(sum(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup
  FROM documents d
  LEFT JOIN exd ON exd.doc_id = d.doc_id
  LEFT JOIN nd ON nd.doc_id = d.doc_id
  GROUP BY 1)
SELECT source, n_docs, n_exact_dup, n_neardup,
       CAST((n_exact_dup * 10000) // n_docs AS BIGINT) AS exact_frac_e4,
       CAST((n_neardup * 10000) // n_docs AS BIGINT) AS near_frac_e4
FROM agg""",

    // bounded min-plus relaxation from the nation-0 supplier seeds,
    // edge cost 1000000 // w (inverse trade volume), 4 rounds — the
    // weighted generalization of g_bfs, same single-reference iterate
    "g_cheapest_path" -> """WITH RECURSIVE cs AS (
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
         's' || CAST(l.l_suppkey AS VARCHAR) AS snode, count(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT cnode AS src, snode AS dst, w FROM cs
  UNION ALL SELECT snode AS src, cnode AS dst, w FROM cs
), e2 AS (
  SELECT src, dst, CAST(1000000 // w AS BIGINT) AS delta FROM e
  UNION ALL SELECT src AS src, src AS dst, CAST(0 AS BIGINT) AS delta
  FROM (SELECT DISTINCT src FROM e)
), sd AS (
  SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
  FROM supplier WHERE s_nationkey = 0
), st AS (
  SELECT 0 AS t, v.src AS node,
         CASE WHEN sd.node IS NOT NULL THEN CAST(0 AS BIGINT) END AS cost
  FROM (SELECT DISTINCT src FROM e) v LEFT JOIN sd ON sd.node = v.src
  UNION ALL
  SELECT t + 1, dst AS node, c AS cost FROM (
    SELECT st.t AS t, e2.dst AS dst, min(st.cost + e2.delta) AS c
    FROM st JOIN e2 ON e2.src = st.node
    WHERE st.t < 4 GROUP BY 1, 2)
)
SELECT node, cost FROM st WHERE t = 4""",

    // co-purchase link prediction: customer pairs sharing >= 3 parts
    // among parts with 2 <= df <= 64 (the declared DfCap), Jaccard of
    // the FULL neighborhoods in e4 fixed point
    "g_common_neighbors" -> """WITH cp AS (
  SELECT DISTINCT o_custkey AS u, l_partkey AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), kept AS (
  SELECT cp.u, cp.v FROM cp
  JOIN (SELECT v FROM cp GROUP BY v HAVING count(*) BETWEEN 2 AND 64) d USING (v)
), g AS (
  SELECT a.u AS ua, b.u AS ub, count(*) AS n
  FROM kept a JOIN kept b ON a.v = b.v AND a.u < b.u
  GROUP BY 1, 2 HAVING count(*) >= 3
), deg AS (SELECT u, count(*) AS d FROM cp GROUP BY u)
SELECT ua AS cust_a, ub AS cust_b, CAST(n AS BIGINT) AS n_common,
       CAST((n * 10000) // (da.d + db.d - n) AS BIGINT) AS jaccard_e4
FROM g JOIN deg da ON da.u = g.ua JOIN deg db ON db.u = g.ub""",

    // gap-based sessionization (30-min inactivity): lag + running sum
    // of session breaks, exact microsecond arithmetic throughout
    "a_sessionize" -> s"""$SESSIONS
SELECT user_id, CAST(sess_idx AS BIGINT) AS sess_idx,
       start_us, end_us, duration_us, n_events, n_types, value_fx
FROM sess""",

    // peak concurrent sessions per day: ±1 boundary sweep in a unique
    // total order (+1 before −1 on ties), day-keyed running sum, and
    // the cross-day carry-in as a prefix over the tiny day frame
    "a_concurrency" -> s"""$SESSIONS, bounds AS (
  SELECT start_us AS us, 1 AS delta, user_id AS u, start_us AS s0 FROM sess
  UNION ALL
  SELECT end_us + 1, -1, user_id, start_us FROM sess
), r AS (
  SELECT us // 86400000000 AS day, delta, us, u, s0,
         sum(delta) OVER (PARTITION BY us // 86400000000
                          ORDER BY us, delta DESC, u, s0
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM bounds
), pd AS (
  SELECT day, max(run) AS peak_local, sum(delta) AS day_delta
  FROM r GROUP BY day
), c AS (
  SELECT day, peak_local,
         coalesce(sum(day_delta) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry
  FROM pd)
SELECT day, CAST(carry + greatest(peak_local, 0) AS BIGINT) AS peak_concurrent FROM c""",

    // densified concurrency: every calendar day in the span gets a
    // row — days with no session boundary report the carried-in level
    "a_concurrency_dense" -> s"""$SESSIONS, bounds AS (
  SELECT start_us AS us, 1 AS delta, user_id AS u, start_us AS s0 FROM sess
  UNION ALL
  SELECT end_us + 1, -1, user_id, start_us FROM sess
), r AS (
  SELECT us // 86400000000 AS day, delta, us, u, s0,
         sum(delta) OVER (PARTITION BY us // 86400000000
                          ORDER BY us, delta DESC, u, s0
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM bounds
), pd AS (
  SELECT day, max(run) AS peak_local, sum(delta) AS day_delta
  FROM r GROUP BY day
), spine AS (
  SELECT unnest(range(min(day), max(day) + 1)) AS day FROM pd
), c AS (
  SELECT spine.day, pd.peak_local,
         coalesce(sum(coalesce(pd.day_delta, 0)) OVER (ORDER BY spine.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry
  FROM spine LEFT JOIN pd ON pd.day = spine.day)
SELECT day, CAST(carry + greatest(coalesce(peak_local, 0), 0) AS BIGINT)
         AS peak_concurrent
FROM c""",

    // LSH band-planner S-curve for the 16-hash signature
    "d_lsh_planner" -> """SELECT CAST(16 / r AS INT) AS bands, CAST(r AS INT) AS rows_per_band,
       round(1.0 - pow(1.0 - pow(CAST(0.3 AS DOUBLE), r), 16 / r), 4) AS p_j03,
       round(1.0 - pow(1.0 - pow(CAST(0.5 AS DOUBLE), r), 16 / r), 4) AS p_j05,
       round(1.0 - pow(1.0 - pow(CAST(0.7 AS DOUBLE), r), 16 / r), 4) AS p_j07,
       round(1.0 - pow(1.0 - pow(CAST(0.9 AS DOUBLE), r), 16 / r), 4) AS p_j09
FROM (SELECT unnest([1, 2, 4, 8, 16]) AS r)""",

    // quantity-weighted type-1 percentiles of price per return flag:
    // integer threshold comparison, price only ever a group key
    "a_weighted_percentiles" -> """WITH hist AS (
  SELECT l_returnflag AS k, l_extendedprice AS x,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wc
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT k, x, wc,
         CAST(sum(wc) OVER (PARTITION BY k ORDER BY x
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM hist
), tot AS (SELECT k, CAST(sum(wc) AS BIGINT) AS tw FROM hist GROUP BY 1
), qs AS (
  SELECT * FROM (VALUES ('q25', 1, 4), ('q50', 1, 2), ('q75', 3, 4))
    AS t(qname, qn, qd))
SELECT cum.k AS l_returnflag, qs.qname, min(cum.x) AS wq_price
FROM cum JOIN tot ON tot.k = cum.k CROSS JOIN qs
WHERE cum.cum * qs.qd >= qs.qn * tot.tw
GROUP BY 1, 2""",

    // top session-opening event-type paths (first 5 events, '>'-joined)
    "a_top_journeys" -> s"""$SESSIONS, pth AS (
  SELECT user_id, sess_idx,
         array_to_string(list_slice(
           list(event_type ORDER BY us, event_id), 1, 5), '>') AS path
  FROM sx GROUP BY 1, 2)
SELECT path, count(*) AS n_sessions
FROM pth GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 20""",

    // RFM quintile scoring: exact long metrics per user; quintile
    // boundaries via quantile_cont (bit-compatible with the engine's
    // shared ExactPercentiles lerp); scores are strict-> comparisons
    "a_rfm" -> """WITH ev AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         CAST(round(value * 1000) AS BIGINT) AS v_fx
  FROM events
), g AS (SELECT max(us) AS gm FROM ev
), u AS (
  SELECT user_id,
         CAST((gm - max(us)) // 86400000000 AS BIGINT) AS recency_days,
         count(*) AS frequency, CAST(sum(v_fx) AS BIGINT) AS monetary_fx
  FROM ev, g GROUP BY user_id, gm
), bd AS (
  SELECT quantile_cont(CAST(recency_days AS DOUBLE), 0.2) AS rp20,
         quantile_cont(CAST(recency_days AS DOUBLE), 0.4) AS rp40,
         quantile_cont(CAST(recency_days AS DOUBLE), 0.6) AS rp60,
         quantile_cont(CAST(recency_days AS DOUBLE), 0.8) AS rp80,
         quantile_cont(CAST(frequency AS DOUBLE), 0.2) AS fp20,
         quantile_cont(CAST(frequency AS DOUBLE), 0.4) AS fp40,
         quantile_cont(CAST(frequency AS DOUBLE), 0.6) AS fp60,
         quantile_cont(CAST(frequency AS DOUBLE), 0.8) AS fp80,
         quantile_cont(CAST(monetary_fx AS DOUBLE), 0.2) AS mp20,
         quantile_cont(CAST(monetary_fx AS DOUBLE), 0.4) AS mp40,
         quantile_cont(CAST(monetary_fx AS DOUBLE), 0.6) AS mp60,
         quantile_cont(CAST(monetary_fx AS DOUBLE), 0.8) AS mp80
  FROM u
), sc AS (
  SELECT user_id, recency_days, frequency, monetary_fx,
         CAST(1 + CASE WHEN recency_days > rp20 THEN 1 ELSE 0 END
                + CASE WHEN recency_days > rp40 THEN 1 ELSE 0 END
                + CASE WHEN recency_days > rp60 THEN 1 ELSE 0 END
                + CASE WHEN recency_days > rp80 THEN 1 ELSE 0 END AS BIGINT) AS r_score,
         CAST(1 + CASE WHEN frequency > fp20 THEN 1 ELSE 0 END
                + CASE WHEN frequency > fp40 THEN 1 ELSE 0 END
                + CASE WHEN frequency > fp60 THEN 1 ELSE 0 END
                + CASE WHEN frequency > fp80 THEN 1 ELSE 0 END AS BIGINT) AS f_score,
         CAST(1 + CASE WHEN monetary_fx > mp20 THEN 1 ELSE 0 END
                + CASE WHEN monetary_fx > mp40 THEN 1 ELSE 0 END
                + CASE WHEN monetary_fx > mp60 THEN 1 ELSE 0 END
                + CASE WHEN monetary_fx > mp80 THEN 1 ELSE 0 END AS BIGINT) AS m_score
  FROM u, bd)
SELECT user_id, recency_days, frequency, monetary_fx, r_score, f_score, m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
FROM sc""",

    // ordered funnel view -> click -> purchase with STRICT inter-step
    // event-time ordering and a 6-hour per-step conversion window;
    // output = funnel-depth histogram
    "a_funnel" -> """WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
), s1 AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1
), s2 AS (SELECT ev.user_id, min(ts) AS t2 FROM ev JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND ts > t1 AND ts <= t1 + INTERVAL '6 hours' GROUP BY 1
), s3 AS (SELECT ev.user_id, min(ts) AS t3 FROM ev JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND ts > t2 AND ts <= t2 + INTERVAL '6 hours' GROUP BY 1
), d AS (
  SELECT u.user_id,
         (CASE WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END +
          CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END +
          CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END) AS depth
  FROM (SELECT DISTINCT user_id FROM ev) u
  LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id))
SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_users FROM d GROUP BY 1""",

    // funnel transitions per hour — the time-resolved twin of
    // a_funnel over the same sequential-min stage chain
    "a_funnel_hourly" -> """WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
), s1 AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1
), s2 AS (SELECT ev.user_id, min(ts) AS t2 FROM ev JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND ts > t1 AND ts <= t1 + INTERVAL '6 hours' GROUP BY 1
), s3 AS (SELECT ev.user_id, min(ts) AS t3 FROM ev JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND ts > t2 AND ts <= t2 + INTERVAL '6 hours' GROUP BY 1
), steps AS (
  SELECT t1 AS ts, CAST(1 AS BIGINT) AS depth FROM s1
  UNION ALL SELECT t2, 2 FROM s2
  UNION ALL SELECT t3, 3 FROM s3)
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, depth, count(*) AS n_steps
FROM steps GROUP BY 1, 2""",

    // weekly cohort retention matrix (both engines truncate weeks to
    // ISO Mondays, so day-diff // 7 is exact)
    "a_cohort" -> """WITH ev AS (
  SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events
), cohorts AS (SELECT user_id, min(wk) AS cw FROM ev GROUP BY 1
), act AS (SELECT DISTINCT user_id, wk FROM ev)
SELECT epoch_us(cw) AS cohort_week_us,
       CAST(date_diff('day', cw, wk) // 7 AS BIGINT) AS week_offset,
       count(*) AS n_active
FROM act JOIN cohorts USING (user_id)
GROUP BY 1, 2""",

    // deterministic bottom-k-by-hash sample: the mergeable uniform
    // sample (per-partition bottom-64 merges to the global bottom-64)
    "d_sample_bottomk" -> s"""SELECT doc_id, lang, ${dh("text")} AS h
FROM documents ORDER BY h, doc_id LIMIT 64""",

    // KMV distinct estimate over the token vocabulary: est = (k-1)/U,
    // U = kth-minimum hash / 2^56; the estimator itself is
    // bit-checked (same h_k -> same division -> same rounded long)
    "t_kmv_distinct" -> s"""$TOKS, v AS (
  SELECT DISTINCT ${dh("tok")} AS h FROM (SELECT unnest(tk) AS tok FROM toks)
), b AS (SELECT h FROM v ORDER BY h LIMIT 64)
SELECT CAST(64 AS BIGINT) AS k, max(h) AS h_k,
       CAST(round(63.0 * 72057594037927936 / max(h)) AS BIGINT) AS est_distinct,
       (SELECT count(*) FROM v) AS exact_distinct
FROM b""",

    // Efraimidis–Spirakis weighted sample: top 200 by u^(1/n_chars),
    // u minted from the portable hash — selection is engine-stable
    // because adjacent key gaps dwarf pow() ulp error
    "d_weighted_sample" -> s"""WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         pow((CAST(${dh("CAST(doc_id AS VARCHAR)")} % 1000000 AS DOUBLE) + 0.5) / 1000000.0,
             1.0 / n_chars) AS k0
  FROM documents)
SELECT doc_id, lang, n_chars, round(k0, 4) AS samp_key
FROM keyed ORDER BY k0 DESC, doc_id LIMIT 200""",

    "d_simhash" -> s"$SIMHASH_FPS SELECT doc_id, simhash FROM fps",

    // oracle = the EXHAUSTIVE all-pairs form: the engine's pigeonhole
    // banding must reproduce it exactly (guaranteed recall), so the
    // two sides are genuinely independent algorithms.
    "d_simhash_pairs" -> s"""$SIMHASH_FPS
SELECT doc_a, doc_b, hamming FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM fps a JOIN fps b ON a.doc_id < b.doc_id)
WHERE hamming <= 3""",

    // SQ8 ANN: candidates dequantized from int8 codes (one per-vector
    // scale mx/127); queries exact — mirror of Similarity.sq8TopK
    "s_ann_sq8" -> S_ANN_SQ8,

    // MMR diversified re-rank: recursive-CTE replay of the engine's
    // greedy selection over the identical top-20 candidate frame;
    // constants CAST to DOUBLE (bare decimals are DECIMAL in DuckDB)
    "s_mmr_rerank" -> """WITH RECURSIVE vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), q AS (
  SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qn FROM vecs WHERE vec_id = 0
), cand0 AS (
  SELECT vec_id, v,
         list_dot_product(qv, v) / (qn * sqrt(list_dot_product(v, v))) AS rel
  FROM vecs CROSS JOIN q WHERE vec_id <> 0
  ORDER BY rel DESC, vec_id LIMIT 20
), sims AS (
  SELECT a.vec_id AS ai, b.vec_id AS bi,
         list_dot_product(a.v, b.v) /
         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
  FROM cand0 a, cand0 b
), it AS (
  SELECT 0 AS t, CAST([] AS BIGINT[]) AS sel, CAST([] AS DOUBLE[]) AS scs
  UNION ALL
  SELECT t+1, list_append(sel, pk['vid']), list_append(scs, pk['score']) FROM (
    SELECT t, sel, scs, (
      SELECT struct_pack(vid := c.vec_id,
        score := CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) *
          coalesce((SELECT max(s.sim) FROM sims s
                    WHERE s.ai = c.vec_id AND list_contains(it.sel, s.bi)),
                   CAST(0.0 AS DOUBLE)))
      FROM cand0 c
      WHERE NOT list_contains(it.sel, c.vec_id)
      ORDER BY CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) *
          coalesce((SELECT max(s.sim) FROM sims s
                    WHERE s.ai = c.vec_id AND list_contains(it.sel, s.bi)),
                   CAST(0.0 AS DOUBLE)) DESC, c.vec_id LIMIT 1) AS pk
    FROM it WHERE t < 5)
)
SELECT CAST(r + 1 AS INT) AS rank, sel[r + 1] AS vec_id,
       round(scs[r + 1], 4) AS mmr_score
FROM it CROSS JOIN (SELECT CAST(unnest(range(0, 5)) AS INT) AS r)
WHERE t = 5""",

    "s_ann_brute" -> S_ANN_BRUTE,

    // per-label centroid through the SAME micro-unit fixed-point sum
    // as the engine's VectorSumFixed: exact longs -> exact doubles, so
    // each element compares bit-for-bit with no rounding. Emitted as
    // one (label, dim, value) row per element — the driver's pandas
    // canonicalizer cannot sort an ARRAY column — zipped by parallel
    // UNNEST so dim i pairs with element i+1 (0-based like posexplode).
    "s_label_centroids" -> s"""WITH cents AS (
  SELECT label,
    [${(1 to 64).map(i =>
    s"(CAST(sum(CAST(round(v[$i]*1000000.0) AS BIGINT)) AS DOUBLE)/1000000.0)/count(*)")
    .mkString(",\n     ")}] AS centroid,
    CAST(count(*) AS BIGINT) AS n_vecs
  FROM (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
  GROUP BY label
)
SELECT label, CAST(dim AS INT) AS dim, value, n_vecs
FROM (SELECT label, n_vecs, UNNEST(range(64)) AS dim, UNNEST(centroid) AS value FROM cents)""",

    // radius search: threshold on the RAW cosine (both engines), emit
    // rounded — no rank window on either side
    "s_ann_range" -> s"""$VECS, q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nv WHERE vec_id < 8
)
SELECT q_id, vec_id AS neighbor_id, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN nv ON vec_id >= 8)
WHERE cos >= 0.35""",

    "s_ann_lsh" -> s"""$VECS, q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket AS q_bucket FROM nv WHERE vec_id < 8
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN nv ON q_bucket = bucket AND vec_id >= 8)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3""",

    "s_ann_ivf" -> s"""$IVF_ASG, q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell AS q_cell FROM asg WHERE vec_id < 8
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN asg ON q_cell = cell AND vec_id >= 8)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3""",

    "s_ann_ivf_mp" -> s"""$IVF_ASG, q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id AS q_cell FROM (
    SELECT nv.vec_id, nv.v, nv.nrm, c.c_id,
           row_number() OVER (PARTITION BY nv.vec_id
             ORDER BY list_dot_product(nv.v, c.cv) / (nv.nrm * c.cn) DESC, c.c_id) AS crnk
    FROM nv, cents c WHERE nv.vec_id < 8) WHERE crnk <= 2
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN asg ON q_cell = cell AND vec_id >= 8)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3""",

    // same as s_ann_ivf_mp at the production dial: 4 probed cells
    "s_ann_ivf_mp4" -> S_ANN_IVF_MP4,

    // two Lloyd rounds: asg (hash codebook, from IVF_ASG) -> means ->
    // asg2 -> means -> asg3; search within the final cells
    "s_ann_ivf_km" -> s"""$IVF_ASG, kc1 AS (
  ${kmMeans("asg")}
), kc1n AS (SELECT c_id, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM kc1
), asg2 AS (
  ${kmAssign("kc1n")}
), kc2 AS (
  ${kmMeans("asg2")}
), kc2n AS (SELECT c_id, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM kc2
), asg3 AS (
  ${kmAssign("kc2n")}
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell AS q_cell FROM asg3 WHERE vec_id < 8
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN asg3 ON q_cell = cell AND vec_id >= 8)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3""",

    // PQ: 8 subspaces x 4 codewords (the hash-sample seeds' slices);
    // encode candidates by argmin L2 (ties -> smaller code), score
    // queries exactly against the reconstruction
    // IVFPQ: IVF cell restriction + PQ-reconstruction-domain scoring —
    // the IVF_ASG chain extended with the PQ encode/recon chain (both
    // independently mirrored elsewhere; here they compose)
    "s_ann_ivfpq" -> ivfPqSql(4),

    // the IVFPQ production dial graduated into the registry: 64
    // codewords per subspace (recall@3 measured per-round in
    // bench_details `recall_at_3`) — same chain, bigger codebook
    "s_ann_ivfpq64" -> ivfPqSql(64),

    "s_ann_pq" -> s"""$PQ_SCORES
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3""",

    // the single-stage PQ production dial graduated into the
    // registry: 64 codewords per subspace (recall@3 measured
    // per-round in bench_details `recall_at_3`) — same chain
    "s_ann_pq64" -> s"""${pqScores(64)}
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3""",

    // two-stage PQ: 10-wide approximate shortlist, exact re-rank to 3
    "s_ann_pq_rerank" -> s"""$PQ_SCORES, short AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
    FROM s) WHERE rn <= 10
), ex AS (
  SELECT sh.q_id, sh.vec_id,
         list_dot_product(q.qv, nv.v) / (q.qn * nv.nrm) AS cos
  FROM short sh JOIN q ON q.q_id = sh.q_id JOIN nv ON nv.vec_id = sh.vec_id)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM ex)
WHERE rnk <= 3""",

    // the production dial: 64 codewords, 50-wide shortlist (recall
    // 0.75 at this dial, measured in bench_details) — same chain
    "s_ann_pq_rerank64" -> S_ANN_PQ_RERANK64,

    "s_ann_lsh_mp" -> s"""$VECS, q0 AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket FROM nv WHERE vec_id < 8
), probes AS (
  SELECT q_id, qv, qn, bucket AS q_bucket FROM q0
  UNION ALL
  SELECT q_id, qv, qn, xor(bucket, CAST(1 AS BIGINT) << i) FROM q0, range(0, 8) t(i)
), s AS (
  SELECT q_id, vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM probes JOIN nv ON q_bucket = bucket AND vec_id >= 8)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 3""",

    // the multiprobe LSH production dial graduated into the registry:
    // 4-bit buckets (16 cells, 5 probes per query — recall@3 measured
    // per-round in bench_details `recall_at_3`); same chain on the
    // 4-bit vecs view
    "s_ann_lsh_mp4" -> S_ANN_LSH_MP4,

    "s_near_dup" -> s"""$VECS, pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
  FROM nv a JOIN nv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b, round(cos, 3) AS cos FROM pairs WHERE cos >= 0.35""",

    // filtered ANN: candidates semi-joined to English documents before
    // scoring (embeddings.vec_id = documents.doc_id)
    "s_ann_filtered" -> s"""$VECS, keep AS (
  SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nv WHERE vec_id < 8
), s AS (
  SELECT q_id, nv.vec_id, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN nv ON nv.vec_id >= 8 JOIN keep ON keep.vec_id = nv.vec_id)
SELECT q_id, vec_id AS neighbor_id, CAST(rnk AS INT) AS rnk, round(cos, 4) AS cos FROM (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk FROM s)
WHERE rnk <= 5""",

    // engine: cached IVF assignment + min-label propagation; oracle:
    // SQL-recomputed cluster pairs + recursive-CTE transitive closure
    // — independent algorithms, identical fixpoint
    "d_semantic_dedup" -> s"""${IVF_ASG.replaceFirst("WITH ", "WITH RECURSIVE ")}, pairs AS (
  SELECT a.vec_id AS pa, b.vec_id AS pb
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35
), e AS (
  SELECT pa AS a, pb AS b FROM pairs
  UNION ALL SELECT pb AS a, pa AS b FROM pairs
), reach AS (
  SELECT vec_id AS doc, vec_id AS lbl FROM embeddings
  UNION
  SELECT e.b AS doc, r.lbl AS lbl FROM reach r JOIN e ON e.a = r.doc
)
SELECT doc AS vec_id, min(lbl) AS group_id FROM reach GROUP BY doc""",

    // directional containment over the same LSH candidates as
    // d_lsh_jaccard; filter on the ROUNDED values, like the engine
    "d_lsh_containment" -> s"""$LSH_CANDS,
sz AS (SELECT doc_id, count(*) AS n_sh FROM h GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cands c
  JOIN h a ON a.doc_id = c.doc_a
  JOIN h b ON b.doc_id = c.doc_b AND b.h = a.h
  GROUP BY 1, 2),
cont AS (
  SELECT doc_a, doc_b,
         round(CAST(n_inter AS DOUBLE) / sa.n_sh, 4) AS c_a_in_b,
         round(CAST(n_inter AS DOUBLE) / sb.n_sh, 4) AS c_b_in_a
  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, c_a_in_b, c_b_in_a FROM cont
WHERE c_a_in_b >= 0.5 OR c_b_in_a >= 0.5""",

    "a_grouping_sets" -> """SELECT l_returnflag, l_linestatus, count(*) AS n,
  round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",

    "m_asset_meta" -> s"""SELECT doc_id AS asset_id,
  CAST(strlen(text) AS BIGINT) AS byte_len,
  substr(text, 1, 8) AS head8,
  substr(text, CAST(strlen(text) // 2 AS INT) + 1, 8) AS mid8,
  ${dh("text")} AS content_hash
FROM documents""",

    // stub audio decode: duration = bytes*1000/rate in integer math
    "m_audio_meta" -> """SELECT doc_id AS asset_id,
  CAST(strlen(text) AS BIGINT) AS byte_len,
  16000 AS sample_rate,
  CAST(CAST(strlen(text) AS BIGINT) * 1000 // 16000 AS BIGINT) AS duration_ms
FROM documents""",

    // character-based on BOTH sides (engine: sliceChars mode; DuckDB
    // length/substr are character-based) — consistent beyond ASCII
    // tile-level partial-dup pairs: 16 char-offset tiles per asset
    // (the m_frame_sample offset convention — division by 16 is a
    // power of two, so Spark's double path and // agree), full tiles
    // only, exact md5-prefix tile hash, df <= 8 boilerplate cap,
    // pairs sharing >= 4 tiles
    "m_tile_neardup" -> s"""WITH tl AS (
  SELECT doc_id AS asset_id,
         substr(text, CAST((i * CAST(length(text) AS BIGINT)) // 16 AS INT) + 1, 64) AS frame
  FROM documents, range(0, 16) t(i)
), th AS (
  SELECT DISTINCT asset_id, ${dh("frame")} AS th
  FROM tl WHERE length(frame) >= 64
), keepable AS (
  SELECT th FROM th GROUP BY th HAVING count(*) <= 8
), k AS (SELECT th.asset_id, th.th FROM th JOIN keepable USING (th))
SELECT a.asset_id AS asset_a, b.asset_id AS asset_b, count(*) AS n_shared_tiles
FROM k a JOIN k b ON a.th = b.th AND a.asset_id < b.asset_id
GROUP BY 1, 2
HAVING count(*) >= 4""",

    "m_frame_sample" -> """SELECT doc_id AS asset_id,
  CAST(i AS BIGINT) AS frame_idx,
  CAST((i * CAST(length(text) AS BIGINT)) // 4 AS BIGINT) AS frame_off,
  substr(text, CAST((i * CAST(length(text) AS BIGINT)) // 4 AS INT) + 1, 8) AS frame_str
FROM documents, range(0, 4) t(i)""",

    // ------------------------------------------------- round-10 widening

    // binary sign-code ANN: two 32-bit words (so shifts never touch
    // the BIGINT sign bit), XOR+popcount Hamming candidates (32),
    // exact cosine rerank with the shared (cos DESC, vec_id) rule
    "s_ann_hamming" -> S_ANN_HAMMING,

    "s_ann_hamming128" -> S_ANN_HAMMING128,

    // Benford first-digit audit: exact cents -> string head digit,
    // e6 fixed point, expected constants shared with the engine
    "a_benford" -> s"""WITH exp AS (
  ${(1 to 9).map(d =>
    s"SELECT CAST($d AS BIGINT) AS digit, CAST(${graft.SparkEntry.BenfordE6(d - 1)} AS BIGINT) AS expected_e6")
    .mkString("\n  UNION ALL ")}
), obs AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         count(*) AS n
  FROM orders GROUP BY 1
), tot AS (SELECT count(*) AS n_tot FROM orders)
SELECT e.digit, coalesce(o.n, 0) AS n,
       coalesce(o.n, 0) * 1000000 // n_tot AS freq_e6,
       e.expected_e6,
       coalesce(o.n, 0) * 1000000 // n_tot - e.expected_e6 AS delta_e6
FROM exp e LEFT JOIN obs o ON e.digit = o.digit CROSS JOIN tot""",

    // degree assortativity: exact edge-endpoint degree moments, one
    // mirrored double chain
    "g_assortativity" -> """WITH cs AS (
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
         's' || CAST(l.l_suppkey AS VARCHAR) AS snode, count(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT cnode AS src, snode AS dst FROM cs
  UNION ALL SELECT snode AS src, cnode AS dst FROM cs
), d AS (SELECT src, count(*) AS degree FROM e GROUP BY 1
), p AS (
  SELECT dx.degree AS dx, dy.degree AS dy
  FROM e JOIN d dx ON e.src = dx.src JOIN d dy ON e.dst = dy.src
), m AS (
  SELECT count(*) AS n, CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
         CAST(sum(dx * dy) AS BIGINT) AS sxy,
         CAST(sum(dx * dx) AS BIGINT) AS sxx,
         CAST(sum(dy * dy) AS BIGINT) AS syy
  FROM p)
SELECT n AS n_edges,
  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
             (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS assortativity
FROM m""",

    // snapshot diff: one full outer join, 4-status partial agg, exact
    // cent deltas
    "e_snapshot_diff" -> """WITH ord AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS p_fx
  FROM orders
), old AS (
  SELECT o_orderkey AS k_old, p_fx AS p_old FROM ord WHERE o_orderkey % 13 <> 0
), neu AS (
  SELECT o_orderkey AS k_new,
         p_fx + (CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END) AS p_new
  FROM ord WHERE o_orderkey % 17 <> 0
), j AS (
  SELECT CASE WHEN k_old IS NULL THEN 'added'
              WHEN k_new IS NULL THEN 'removed'
              WHEN p_old <> p_new THEN 'changed'
              ELSE 'unchanged' END AS status,
         coalesce(abs(p_new - p_old), 0) AS adelta
  FROM old FULL OUTER JOIN neu ON k_old = k_new)
SELECT status, count(*) AS n, CAST(sum(adelta) AS BIGINT) AS sum_abs_delta_fx
FROM j GROUP BY 1""",

    // every graduated quality dial's recall@3 replayed END-TO-END:
    // each variant's full ranking re-derived, hit counts exact
    // recall@k curve: matched neighbors first count at
    // k = max(rnk_b, rnk_h); one cumulative probe over that histogram
    "s_recall_curve" -> s"""WITH b AS (
  SELECT q_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk_b FROM ($S_ANN_BRUTE)
), h AS (
  SELECT q_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk_h FROM ($S_ANN_HAMMING)
), mm AS (
  SELECT greatest(rnk_b, rnk_h) AS m FROM b JOIN h USING (q_id, neighbor_id)
), hist AS (SELECT m, count(*) AS c FROM mm GROUP BY 1
), nq AS (SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS n_q FROM b
), ks AS (SELECT CAST(unnest(range(1, 6)) AS BIGINT) AS k)
SELECT k, CAST(coalesce(sum(c), 0) AS BIGINT) AS hits,
       CAST(coalesce(sum(c), 0) * 10000 // (k * n_q) AS BIGINT) AS recall_e4
FROM ks LEFT JOIN hist ON m <= k CROSS JOIN nq
GROUP BY k, n_q""",

    "s_ann_recall_audit" -> {
      def one(name: String, sql: String) = s"""SELECT '$name' AS variant, b.q_id,
       CAST(count(h.neighbor_id) AS BIGINT) AS hits,
       CAST(count(h.neighbor_id) AS BIGINT) * 10000 // 3 AS recall_e4
FROM (SELECT q_id, neighbor_id FROM ($S_ANN_BRUTE) WHERE rnk <= 3) b
LEFT JOIN (SELECT q_id, neighbor_id FROM ($sql) WHERE rnk <= 3) h
  ON b.q_id = h.q_id AND b.neighbor_id = h.neighbor_id
GROUP BY 1, 2"""
      Seq(
        one("s_ann_hamming", S_ANN_HAMMING),
        one("s_ann_lsh_mp4", S_ANN_LSH_MP4),
        one("s_ann_ivf_mp4", S_ANN_IVF_MP4),
        one("s_ann_pq_rerank64", S_ANN_PQ_RERANK64),
        one("s_ann_sq8", S_ANN_SQ8)).mkString("\nUNION ALL\n")
    },

    // basket association rules: pair support via basket self-join,
    // min-support 3 gate, both directions, e4 integer fixed point
    "a_basket_rules" -> """WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items
), supp AS (SELECT l_partkey, count(*) AS supp FROM items GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS supp_ab
  FROM items a JOIN items b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 3
), rules AS (
  SELECT pa AS ante, pb AS cons, supp_ab FROM pairs
  UNION ALL
  SELECT pb AS ante, pa AS cons, supp_ab FROM pairs)
SELECT r.ante, r.cons, r.supp_ab,
       sa.supp AS supp_ante, sc.supp AS supp_cons,
       r.supp_ab * 10000 // sa.supp AS conf_e4,
       r.supp_ab * no.n_orders * 10000 // (sa.supp * sc.supp) AS lift_e4
FROM rules r
JOIN supp sa ON sa.l_partkey = r.ante
JOIN supp sc ON sc.l_partkey = r.cons
CROSS JOIN no""",

    // l-diversity: distinct sensitive values per QI group
    "a_l_diversity" -> """SELECT c_nationkey,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
       count(*) AS group_size,
       count(DISTINCT c_mktsegment) AS l_distinct,
       (count(DISTINCT c_mktsegment) < 3) AS at_risk
FROM customer GROUP BY 1, 2""",

    // RTBF cascade audit: every 97th customer -> their orders -> those
    // orders' line items; one row per table
    "e_forget" -> """WITH tomb AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
), ordrm AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM tomb)
), a AS (
  SELECT 'customer' AS table_name,
         (SELECT count(*) FROM customer) AS n_rows,
         (SELECT count(*) FROM tomb) AS n_removed
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM ordrm)
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM ordrm)))
SELECT table_name, n_rows, n_removed, n_rows - n_removed AS n_kept FROM a""",

    // the incremental four-term view must equal the from-scratch
    // aggregate, so its oracle IS the full join aggregate — the
    // join-view delta rule proved on the gate
    "a_mv_join_delta" -> """SELECT o_orderpriority, l_returnflag,
  count(*) AS n_items,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_fx
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2""",

    // gap fill: day spine per observed type (bounds from the FULL
    // frame), LOCF + linear interpolation from ignore-nulls anchors;
    // interp = exact integer anchors, one double ratio, round at
    // emission (both engines HALF_UP on positives)
    "a_gap_fill" -> """WITH d AS (
  SELECT min(epoch_us(ts) // 86400000000) AS min_day,
         max(epoch_us(ts) // 86400000000) AS max_day
  FROM events
), obs AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         max(CAST(round(value * 10000) AS BIGINT)) AS v_fx
  FROM events WHERE value > 300 GROUP BY 1, 2
), spine AS (
  SELECT event_type, unnest(range(min_day, max_day + 1)) AS day
  FROM (SELECT DISTINCT event_type FROM obs) CROSS JOIN d
), j AS (
  SELECT s.event_type, s.day, o.v_fx,
    last_value(o.v_fx IGNORE NULLS) OVER (PARTITION BY s.event_type ORDER BY s.day
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
    last_value(CASE WHEN o.v_fx IS NOT NULL THEN s.day END IGNORE NULLS)
      OVER (PARTITION BY s.event_type ORDER BY s.day
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
    first_value(o.v_fx IGNORE NULLS) OVER (PARTITION BY s.event_type ORDER BY s.day
      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN o.v_fx IS NOT NULL THEN s.day END IGNORE NULLS)
      OVER (PARTITION BY s.event_type ORDER BY s.day
      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
  FROM spine s LEFT JOIN obs o ON o.event_type = s.event_type AND o.day = s.day)
SELECT event_type, day, v_fx,
  coalesce(v_fx, pv) AS locf_fx,
  CASE WHEN v_fx IS NOT NULL THEN v_fx
       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
         CAST(round(pv + (nv - pv) * (CAST(day - pd AS DOUBLE) /
              CAST(nd - pd AS DOUBLE))) AS BIGINT)
       ELSE coalesce(pv, nv) END AS interp_fx,
  (v_fx IS NULL) AS is_gap
FROM j""",

    // one-vs-rest rank-sum AUC from the score histogram: doubled
    // midrank 2*start + c - 1 keeps everything integer
    "s_auc" -> s"""WITH scored AS (
  SELECT label, CAST(round((1.0 / (1.0 + exp(-(list_dot_product(
    list_transform(embedding, x -> CAST(x AS DOUBLE)),
    [${graft.SparkEntry.ModelWeights.mkString(", ")}]) + 0.1)))) * 10000) AS BIGINT) AS s_e4
  FROM embeddings
), hist AS (SELECT s_e4, count(*) AS c FROM scored GROUP BY 1
), starts AS (
  SELECT s_e4, c,
         coalesce(sum(c) OVER (ORDER BY s_e4
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS start
  FROM hist
), perls AS (SELECT s_e4, label, count(*) AS n_ls FROM scored GROUP BY 1, 2
), tot AS (SELECT count(*) AS n_tot FROM scored
), agg AS (
  SELECT label,
         CAST(sum(n_ls * (2 * start + c - 1)) AS BIGINT) AS sum_r2,
         CAST(sum(n_ls) AS BIGINT) AS npos
  FROM perls JOIN starts USING (s_e4) GROUP BY 1)
SELECT label, npos, n_tot - npos AS nneg,
       (sum_r2 - npos * (npos + 1)) * 500000 // (npos * (n_tot - npos)) AS auc_e6
FROM agg CROSS JOIN tot""",

    // two-proportion A/B test: parity split, heavy-purchaser success,
    // exact counts + ONE double z chain mirrored operation-for-
    // operation (guarded degenerate edge)
    "a_abtest" -> """WITH u AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY 1
), agg AS (
  SELECT (user_id % 2 = 0) AS in_a, count(*) AS n, sum(conv) AS k
  FROM u GROUP BY 1
), w AS (
  SELECT a.n AS n_a, CAST(a.k AS BIGINT) AS k_a,
         b.n AS n_b, CAST(b.k AS BIGINT) AS k_b
  FROM (SELECT n, k FROM agg WHERE in_a) a
  CROSS JOIN (SELECT n, k FROM agg WHERE NOT in_a) b)
SELECT n_a, k_a, n_b, k_b,
  k_a * 10000 // n_a AS conv_a_e4,
  k_b * 10000 // n_b AS conv_b_e4,
  CASE WHEN k_a + k_b = 0 OR k_a + k_b = n_a + n_b THEN NULL
    ELSE round((CAST(k_a AS DOUBLE) / n_a - CAST(k_b AS DOUBLE) / n_b) /
      sqrt((CAST(k_a + k_b AS DOUBLE) / (n_a + n_b)) *
           (1.0 - CAST(k_a + k_b AS DOUBLE) / (n_a + n_b)) *
           (1.0 / n_a + 1.0 / n_b)), 4) END AS z
FROM w""",

    // blocking join: first-token blocks, levenshtein verify on the
    // blocked pairs only
    "d_blocking_join" -> """WITH n AS (
  SELECT DISTINCT p_name, split_part(p_name, ' ', 1) AS blk FROM part
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM n a JOIN n b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3""",

    // Kneser-Ney bigram probabilities in exact quarters (D = 3/4):
    // two truncating divisions per row, term-split for headroom
    "t_bigram_kn" -> s"""$KN_BI
SELECT w1, w2, c12, p_kn_e6 FROM kn_bi ORDER BY c12 DESC, w1, w2 LIMIT 50""",

    // interpolated trigram KN: the shipped bigram KN as the lower
    // order, one more truncating division per row
    "t_trigram_kn" -> s"""$KN_BI, occ3 AS (
  SELECT unnest(list_transform(range(1, greatest(len(tk)-2, 0)+1),
    i -> array_to_string(tk[i:i+2], ' '))) AS s
  FROM toks
), t AS (
  SELECT split_part(s, ' ', 1) AS w1, split_part(s, ' ', 2) AS w2,
         split_part(s, ' ', 3) AS w3, count(*) AS c123
  FROM occ3 GROUP BY 1, 2, 3
), ctx AS (
  SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12ctx, count(*) AS n1f12
  FROM t GROUP BY 1, 2)
SELECT t.w1, t.w2, t.w3, c123,
       greatest(4 * c123 - 3, 0) * 1000000 // (4 * c12ctx) +
       3 * n1f12 * k.p_kn_e6 // (4 * c12ctx) AS p_kn3_e6
FROM t JOIN ctx USING (w1, w2) JOIN kn_bi k ON k.w1 = t.w2 AND k.w2 = t.w3
ORDER BY c123 DESC, t.w1, t.w2, t.w3 LIMIT 50""",

    // Zipf fit over the count-of-counts histogram: e4-fixed logs,
    // exact weighted moments, the a_trend double projection
    // vocabulary-coverage curve on the count-of-counts histogram:
    // tie-group algebra makes coverage at N engine-exact with no
    // token-level ranking; budgets past the vocab coalesce to full
    "t_ngram_coverage" -> s"""$TOKS, tf AS (
  SELECT t AS token, count(*) AS cnt FROM toks, unnest(tk) AS u(t) GROUP BY 1
), hist AS (SELECT cnt, count(*) AS c FROM tf GROUP BY 1
), starts AS (
  SELECT cnt, c,
         CAST(coalesce(sum(c) OVER (ORDER BY cnt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
           AS BIGINT) AS start,
         CAST(coalesce(sum(cnt * c) OVER (ORDER BY cnt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS mass_before
  FROM hist
), tot AS (
  SELECT CAST(sum(cnt * c) AS BIGINT) AS m_tot,
         CAST(sum(c) AS BIGINT) AS v_tot
  FROM hist
), ns AS (SELECT CAST(1000 * (1 << CAST(unnest(range(0, 6)) AS INT))
            AS BIGINT) AS n_vocab)
SELECT n_vocab, least(n_vocab, v_tot) AS n_kept,
       CAST(coalesce(mass_before + cnt * (n_vocab - start + 1), m_tot)
            AS BIGINT) AS mass,
       CAST(coalesce(mass_before + cnt * (n_vocab - start + 1), m_tot)
            * 1000000 // m_tot AS BIGINT) AS coverage_e6
FROM ns LEFT JOIN starts ON n_vocab >= start AND n_vocab < start + c
CROSS JOIN tot""",

    "t_zipf" -> s"""$TOKS, tf AS (
  SELECT token, count(*) AS cnt FROM (SELECT unnest(tk) AS token FROM toks)
  GROUP BY 1
), hist AS (SELECT cnt, count(*) AS c FROM tf GROUP BY 1
), st AS (
  SELECT cnt, c,
         coalesce(sum(c) OVER (ORDER BY cnt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS start
  FROM hist
), pts AS (
  SELECT c,
         CAST(round(ln((2 * start + c - 1) / 2.0) * 10000) AS BIGINT) AS x,
         CAST(round(ln(CAST(cnt AS DOUBLE)) * 10000) AS BIGINT) AS y
  FROM st
), m AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * x) AS BIGINT) AS sx, CAST(sum(c * y) AS BIGINT) AS sy,
         CAST(sum(c * x * y) AS BIGINT) AS sxy,
         CAST(sum(c * x * x) AS BIGINT) AS sxx
  FROM pts)
SELECT n AS n_vocab,
  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 4) AS slope,
  round((CAST(sy AS DOUBLE) -
        (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx) / n / 10000.0,
        4) AS intercept
FROM m""",

    // JSON property extraction with an unparsed-count audit column
    "a_props_extract" -> """WITH p AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type, count(*) AS n,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unparsed,
       CAST(sum(coalesce(k, 0)) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k,
       count(DISTINCT k) AS n_distinct_k
FROM p GROUP BY 1""",

    // trailing 15-day rolling median, doubled-integer form over the
    // bounded window frame list
    "a_rolling_median" -> """WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), f AS (
  SELECT event_type, day, x,
         list_sort(list(x) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)) AS frame
  FROM daily)
SELECT event_type, day, x,
       CAST(len(frame) AS BIGINT) AS n_window,
       frame[CAST((len(frame) + 1) // 2 AS INT)] +
       frame[CAST((len(frame) + 2) // 2 AS INT)] AS med2_roll
FROM f""",

    // median/MAD outliers in doubled-integer form: med2 = two middle
    // order stats summed, mad4 = doubled median of |2x - med2|
    "a_anomaly_mad" -> """WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), rx AS (
  SELECT event_type, day, x,
         row_number() OVER (PARTITION BY event_type ORDER BY x, day) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
), med AS (
  SELECT event_type,
         CAST(sum(CASE WHEN r = (n + 1) // 2 THEN x ELSE 0 END +
                  CASE WHEN r = (n + 2) // 2 THEN x ELSE 0 END) AS BIGINT) AS med2
  FROM rx GROUP BY 1
), dev AS (
  SELECT d.event_type, d.day, d.x, m.med2, abs(d.x * 2 - m.med2) AS dev2
  FROM daily d JOIN med m USING (event_type)
), rd AS (
  SELECT event_type, day, dev2,
         row_number() OVER (PARTITION BY event_type ORDER BY dev2, day) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type,
         CAST(sum(CASE WHEN r = (n + 1) // 2 THEN dev2 ELSE 0 END +
                  CASE WHEN r = (n + 2) // 2 THEN dev2 ELSE 0 END) AS BIGINT) AS mad4
  FROM rd GROUP BY 1)
SELECT dev.event_type, day, x, med2, mad4,
       (dev2 * 2 > mad4 * 3) AS is_outlier
FROM dev JOIN mad USING (event_type)""",

    // CUSUM in closed form: prefix sums + running min per type, all
    // exact longs; mu/kappa/h from truncating divisions
    "a_cusum" -> """WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), mu AS (
  SELECT event_type, CAST(sum(x) AS BIGINT) // count(*) AS mu
  FROM daily GROUP BY 1
), d AS (
  SELECT daily.event_type, day, x, mu,
         x - mu - mu // 50 AS d,
         mu - mu // 50 - x AS e
  FROM daily JOIN mu USING (event_type)
), pfx AS (
  SELECT event_type, day, x, mu,
    sum(d) OVER (PARTITION BY event_type ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
    sum(e) OVER (PARTITION BY event_type ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q
  FROM d
), st AS (
  SELECT event_type, day, x, mu,
    p - least(min(p) OVER (PARTITION BY event_type ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sp,
    q - least(min(q) OVER (PARTITION BY event_type ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sn
  FROM pfx)
SELECT event_type, day, x, CAST(sp AS BIGINT) AS sp_fx, CAST(sn AS BIGINT) AS sn_fx,
       (sp > mu // 10) AS alarm_up, (sn > mu // 10) AS alarm_down
FROM st""",


    // 4096-bucket quantized Gini: per-bucket tie groups via the
    // doubled rank-sum identity, all integers
    "a_gini" -> """WITH rev AS (
  SELECT o_custkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
             (100 - CAST(round(l_discount * 100) AS BIGINT))) AS x
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
), mx AS (SELECT max(x) AS mx FROM rev
), bk AS (
  SELECT x * 4096 // (mx + 1) AS b, count(*) AS c, sum(x) AS bx
  FROM rev CROSS JOIN mx GROUP BY 1
), st AS (
  SELECT b, c, bx,
         coalesce(sum(c) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS start
  FROM bk
), agg AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(bx) AS BIGINT) AS t,
         CAST(sum(bx * (2 * start + c - 1)) AS BIGINT) AS s2
  FROM st)
SELECT n, t, round(CAST(s2 - (n + 1) * t AS DOUBLE) / n / t, 6) AS gini FROM agg""",

    // kNN vote over the brute-force top-5 with (votes DESC, best
    // rank, label) tie-break
    "s_knn_classify" -> s"""$VECS, q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nv WHERE vec_id < 8
), s AS (
  SELECT q_id, vec_id, label, list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN nv ON vec_id >= 8
), nn AS (
  SELECT q_id, vec_id, label, rnk FROM (
    SELECT q_id, vec_id, label, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
    FROM s)
  WHERE rnk <= 5
), votes AS (
  SELECT q_id, label, count(*) AS votes, CAST(min(rnk) AS INT) AS best_rnk
  FROM nn GROUP BY 1, 2)
SELECT q_id, label AS pred_label, votes, best_rnk FROM (
  SELECT q_id, label, votes, best_rnk,
         row_number() OVER (PARTITION BY q_id
           ORDER BY votes DESC, best_rnk, label) AS rk
  FROM votes)
WHERE rk = 1""",

    // PR curve at 21 fixed thresholds from the score histogram, all
    // exact integers with a mirrored NULL guard
    "s_pr_curve" -> s"""WITH scored AS (
  SELECT CAST(label < 5 AS BIGINT) AS pos,
         CAST(round((1.0 / (1.0 + exp(-(list_dot_product(
    list_transform(embedding, x -> CAST(x AS DOUBLE)),
    [${graft.SparkEntry.ModelWeights.mkString(", ")}]) + 0.1)))) * 10000) AS BIGINT) AS s_e4
  FROM embeddings
), hist AS (SELECT s_e4, count(*) AS c, CAST(sum(pos) AS BIGINT) AS cp
            FROM scored GROUP BY 1
), thr AS (SELECT CAST(unnest(range(0, 21)) * 500 AS BIGINT) AS t
), tot AS (SELECT count(*) AS n_tot, CAST(sum(pos) AS BIGINT) AS n_pos FROM scored
), agg AS (
  SELECT t, CAST(coalesce(sum(c), 0) AS BIGINT) AS n_pred,
         CAST(coalesce(sum(cp), 0) AS BIGINT) AS tp
  FROM thr LEFT JOIN hist ON s_e4 >= t GROUP BY 1)
SELECT t, n_pred, tp, n_pred - tp AS fp, n_pos - tp AS fn,
  CASE WHEN n_pred = 0 THEN NULL ELSE tp * 10000 // n_pred END AS precision_e4,
  tp * 10000 // n_pos AS recall_e4,
  2 * tp * 10000 // (n_pred + n_pos) AS f1_e4
FROM agg CROSS JOIN tot""",

    // reliability table: ten score bins vs the label < 5 target, all
    // integer sums and truncating divisions
    "s_calibration" -> s"""WITH scored AS (
  SELECT label, CAST(round((1.0 / (1.0 + exp(-(list_dot_product(
    list_transform(embedding, x -> CAST(x AS DOUBLE)),
    [${graft.SparkEntry.ModelWeights.mkString(", ")}]) + 0.1)))) * 10000) AS BIGINT) AS s_e4
  FROM embeddings)
SELECT least(s_e4 // 1000, 9) AS bin, count(*) AS n,
       CAST(sum(s_e4) // count(*) AS BIGINT) AS mean_pred_e4,
       CAST(sum(CASE WHEN label < 5 THEN 1 ELSE 0 END) * 10000 // count(*)
            AS BIGINT) AS frac_pos_e4
FROM scored GROUP BY 1""",

    // NDCG@10 + AP@10 per query over the exact cosine top-10;
    // relevance = shared label, discounts are the e6-fixed literals
    // graft.SparkEntry.NdcgDiscE6 — no transcendental runs here either
    "s_rank_eval" -> s"""$VECS, q AS (
  SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
  FROM nv WHERE vec_id < 8
), s AS (
  SELECT q_id, q_label, vec_id, label AS n_label,
         list_dot_product(qv, v) / (qn * nrm) AS cos
  FROM q JOIN nv ON vec_id >= 8
), nn AS (
  SELECT q_id, q_label, vec_id, n_label, rnk FROM (
    SELECT q_id, q_label, vec_id, n_label, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
    FROM s)
  WHERE rnk <= 10
), nrel AS (
  SELECT qq.vec_id AS q_id, CAST(count(cc.vec_id) AS BIGINT) AS n_rel
  FROM nv qq LEFT JOIN nv cc ON cc.vec_id >= 8 AND cc.label = qq.label
  WHERE qq.vec_id < 8 GROUP BY 1
), terms AS (
  SELECT nn.q_id, q_label, n_rel,
         CAST(n_label = q_label AS BIGINT) AS rel, rnk,
         sum(CAST(n_label = q_label AS BIGINT))
           OVER (PARTITION BY nn.q_id ORDER BY rnk) AS hits
  FROM nn JOIN nrel ON nn.q_id = nrel.q_id
), agg AS (
  SELECT q_id, q_label, n_rel,
         CAST(sum(rel) AS BIGINT) AS hits10,
         CAST(sum(rel * ([${graft.SparkEntry.NdcgDiscE6.mkString(", ")}])[rnk]) AS BIGINT) AS dcg_e6,
         CASE WHEN n_rel = 0 THEN NULL
              ELSE CAST(([${graft.SparkEntry.NdcgIdcgE6.mkString(", ")}])[least(n_rel, 10)] AS BIGINT) END AS idcg_e6,
         CAST(sum(rel * (hits * 10000 // rnk)) AS BIGINT) AS ap_sum_e4
  FROM terms GROUP BY 1, 2, 3)
SELECT q_id, q_label, n_rel, hits10, dcg_e6, idcg_e6,
  CASE WHEN idcg_e6 IS NULL THEN NULL
       ELSE dcg_e6 * 10000 // idcg_e6 END AS ndcg_e4,
  CASE WHEN n_rel = 0 THEN NULL
       ELSE ap_sum_e4 // least(n_rel, 10) END AS ap_e4
FROM agg""",

    // chi-squared independence of event volume vs day-of-week, exact
    // e4 fixed-point over the DENSIFIED contingency table
    "a_chi2" -> """WITH ev AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 % 7 AS dow
  FROM events
), obs AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS o FROM ev GROUP BY 1, 2
), rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1
), ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1
), tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
         CAST(count(DISTINCT dow) AS BIGINT) AS n_dows
  FROM obs
), cells AS (
  SELECT rt.event_type, ct.dow, r, c, coalesce(o, 0) AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN obs ON obs.event_type = rt.event_type AND obs.dow = ct.dow
), contrib AS (
  SELECT n, n_types, n_dows,
         CASE WHEN r * c * 10000 // n = 0 THEN NULL
              ELSE (o * 10000 - r * c * 10000 // n)
                 * (o * 10000 - r * c * 10000 // n)
                 // ((r * c * 10000 // n) * 10000) END AS contrib_e4
  FROM cells CROSS JOIN tot)
SELECT n, n_types, n_dows, (n_types - 1) * (n_dows - 1) AS dof,
       CAST(sum(contrib_e4) AS BIGINT) AS chi2_e4,
       CAST(max(contrib_e4) AS BIGINT) AS max_contrib_e4
FROM contrib GROUP BY 1, 2, 3""",

    // longest consecutive-day streak per user (gaps-and-islands);
    // best = longest then earliest start
    "a_streaks" -> """WITH days AS (
  SELECT DISTINCT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
  FROM events
), isl AS (
  SELECT user_id, day,
         day - dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
), st AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len, min(day) AS start_day
  FROM isl GROUP BY 1, 2
), rk AS (
  SELECT user_id, len, start_day,
         row_number() OVER (PARTITION BY user_id
           ORDER BY len DESC, start_day) AS rn
  FROM st
), agg AS (
  SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
         CAST(count(*) AS BIGINT) AS n_streaks
  FROM st GROUP BY 1)
SELECT agg.user_id, n_active_days, n_streaks,
       len AS best_len, start_day AS best_start_day
FROM agg JOIN rk ON agg.user_id = rk.user_id AND rn = 1""",

    // RAKE keywords: phrases = non-stopword runs, word score =
    // deg*1e4 // freq, phrase score = sum of member scores; top 30
    "t_rake" -> """WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     t -> len(t) > 0) AS tk
  FROM documents
), pt AS (
  SELECT doc_id, pos, tk[pos] AS t
  FROM toks, unnest(range(1, len(tk) + 1)) AS r(pos)
), ns AS (
  SELECT doc_id, pos, t,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM pt WHERE t NOT IN ('the','and','of','to','is','in','a')
), ph AS (
  SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS plen,
         string_agg(t, ' ' ORDER BY pos) AS phrase
  FROM ns GROUP BY 1, 2
), ws AS (
  SELECT t, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(plen) AS BIGINT) AS deg
  FROM ns JOIN ph USING (doc_id, grp) GROUP BY t
), pscore AS (
  SELECT ns.doc_id, ns.grp,
         CAST(sum(deg * 10000 // freq) AS BIGINT) AS score_e4
  FROM ns JOIN ws ON ns.t = ws.t GROUP BY 1, 2)
SELECT phrase, CAST(max(plen) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_occ,
       CAST(max(score_e4) AS BIGINT) AS score_e4
FROM ph JOIN pscore USING (doc_id, grp)
GROUP BY phrase
ORDER BY score_e4 DESC, phrase LIMIT 30""",

    // data-contract audit: one conditional-aggregate pass per table,
    // unpivoted to per-rule rows, plus the FK anti-join count
    "p_contract_audit" -> """WITH li AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v3
  FROM lineitem
), ord AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v3
  FROM orders
), ev AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN user_id < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(CASE WHEN event_type IS NULL OR len(event_type) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v3
  FROM events
), fk AS (
  SELECT CAST(count(*) AS BIGINT) AS n_violations
  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
), rows_ AS (
  SELECT 'lineitem' AS table_name, n, 'qty_in_1_50' AS rule, v1 AS n_violations FROM li
  UNION ALL SELECT 'lineitem', n, 'discount_in_0_01', v2 FROM li
  UNION ALL SELECT 'lineitem', n, 'shipdate_not_null', v3 FROM li
  UNION ALL SELECT 'orders', n, 'totalprice_positive', v1 FROM ord
  UNION ALL SELECT 'orders', n, 'status_enum', v2 FROM ord
  UNION ALL SELECT 'orders', n, 'orderkey_unique', v3 FROM ord
  UNION ALL SELECT 'events', n, 'value_not_null', v1 FROM ev
  UNION ALL SELECT 'events', n, 'user_id_nonneg', v2 FROM ev
  UNION ALL SELECT 'events', n, 'event_type_nonempty', v3 FROM ev
  UNION ALL SELECT 'lineitem', CAST(NULL AS BIGINT), 'orderkey_fk', n_violations FROM fk)
SELECT table_name, n, rule, n_violations, n_violations = 0 AS pass
FROM rows_""",

    // exact average precision over ALL operating points of the score
    // histogram, plus the best-F1 point (highest F1, then threshold)
    "s_pr_auc" -> s"""WITH scored AS (
  SELECT CAST(label < 5 AS BIGINT) AS pos,
         CAST(round((1.0 / (1.0 + exp(-(list_dot_product(
    list_transform(embedding, x -> CAST(x AS DOUBLE)),
    [${graft.SparkEntry.ModelWeights.mkString(", ")}]) + 0.1)))) * 10000) AS BIGINT) AS s_e4
  FROM embeddings
), hist AS (SELECT s_e4, CAST(count(*) AS BIGINT) AS c,
                   CAST(sum(pos) AS BIGINT) AS cp
            FROM scored GROUP BY 1
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(pos) AS BIGINT) AS n_pos FROM scored
), cum AS (
  SELECT s_e4, cp,
         CAST(sum(cp) OVER (ORDER BY s_e4 DESC) AS BIGINT) AS tp,
         CAST(sum(c) OVER (ORDER BY s_e4 DESC) AS BIGINT) AS n_pred
  FROM hist
), terms AS (
  SELECT n, n_pos, s_e4,
         cp * (tp * 1000000 // n_pred) AS term_e6,
         2 * tp * 10000 // (n_pred + n_pos) AS f1_e4
  FROM cum CROSS JOIN tot
), best AS (
  SELECT n, n_pos, s_e4 AS best_f1_thr_e4, f1_e4 AS best_f1_e4
  FROM (SELECT *, row_number() OVER (ORDER BY f1_e4 DESC, s_e4 DESC) AS rk
        FROM terms)
  WHERE rk = 1)
SELECT t.n, t.n_pos,
       CAST(count(*) AS BIGINT) AS n_thresholds,
       CAST(sum(term_e6) // max(t.n_pos) AS BIGINT) AS ap_e6,
       max(best_f1_e4) AS best_f1_e4, max(best_f1_thr_e4) AS best_f1_thr_e4
FROM terms t CROSS JOIN best GROUP BY t.n, t.n_pos""",

    // cluster-quality in exact integer geometry: e4-quantized
    // embeddings, truncating-mean centroids, squared distances only
    "s_cluster_quality" -> """WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS ve4
  FROM embeddings
), nl AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1
), s AS (
  SELECT label, dim, CAST(sum(ve4[dim]) AS BIGINT) AS sv
  FROM e, unnest(range(1, 65)) AS r(dim) GROUP BY 1, 2
), c AS (
  SELECT s.label, n, list(sv // n ORDER BY dim) AS ce4
  FROM s JOIN nl USING (label) GROUP BY s.label, n
), d AS (
  SELECT e.label,
         CAST(list_sum(list_transform(range(1, 65),
           i -> (ve4[i] - ce4[i]) * (ve4[i] - ce4[i]))) AS BIGINT) AS d2
  FROM e JOIN c USING (label)
), coh AS (
  SELECT label, CAST(sum(d2) // count(*) AS BIGINT) AS cohesion_d2_mean
  FROM d GROUP BY 1
), sep AS (
  SELECT label, sd2 AS sep_d2, other_label AS nearest_label FROM (
    SELECT a.label, b.label AS other_label,
           CAST(list_sum(list_transform(range(1, 65),
             i -> (a.ce4[i] - b.ce4[i]) * (a.ce4[i] - b.ce4[i]))) AS BIGINT) AS sd2,
           row_number() OVER (PARTITION BY a.label
             ORDER BY list_sum(list_transform(range(1, 65),
               i -> (a.ce4[i] - b.ce4[i]) * (a.ce4[i] - b.ce4[i]))), b.label) AS rk
    FROM c a JOIN c b ON a.label <> b.label)
  WHERE rk = 1)
SELECT c.label, n, cohesion_d2_mean, nearest_label, sep_d2,
       CASE WHEN sep_d2 = 0 THEN NULL
            ELSE cohesion_d2_mean * 10000 // sep_d2 END AS ratio_e4
FROM c JOIN coh USING (label) JOIN sep USING (label)""",

    // integer Bollinger: (n·x − Σx)² > k²·(n·Σx² − (Σx)²) on the
    // trailing 7 observed days, breaches only
    "a_bollinger_breach" -> """WITH daily AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
           // CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type, day, x,
         CAST(count(*) OVER tw AS BIGINT) AS nw,
         CAST(sum(x) OVER tw AS BIGINT) AS sx,
         CAST(sum(x * x) OVER tw AS BIGINT) AS sxx
  FROM daily
  WINDOW tw AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT event_type, day, x AS x_fx,
       (7 * x - sx) * (7 * x - sx) AS dev2,
       7 * sxx - sx * sx AS var7,
       7 * x - sx > 0 AS hi
FROM w
WHERE nw = 7 AND (7 * x - sx) * (7 * x - sx) > 4 * (7 * sxx - sx * sx)""",

    // exact two-sample KS on cent-quantized values: D clears its
    // denominators, argmax reports the earliest threshold
    "a_ks_test" -> """WITH vals AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_e2
  FROM events WHERE event_type IN ('click', 'view')
), hist AS (
  SELECT v_e2,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM vals GROUP BY 1
), tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                  CAST(sum(c2) AS BIGINT) AS n2 FROM hist
), cum AS (
  SELECT v_e2,
         CAST(sum(c1) OVER (ORDER BY v_e2) AS BIGINT) AS f1,
         CAST(sum(c2) OVER (ORDER BY v_e2) AS BIGINT) AS f2
  FROM hist
), d AS (
  SELECT v_e2, abs(f1 * n2 - f2 * n1) AS d_num, n1, n2
  FROM cum CROSS JOIN tot
), best AS (
  SELECT n1, n2, d_num, v_e2 FROM (
    SELECT *, row_number() OVER (ORDER BY d_num DESC, v_e2) AS rk FROM d)
  WHERE rk = 1)
SELECT n1, n2, (SELECT CAST(count(*) AS BIGINT) FROM hist) AS n_support,
       d_num * 1000000 // (n1 * n2) AS d_e6, v_e2 AS at_v_e2
FROM best""",

    // per-dimension mean shift between the vec_id-parity halves of
    // the embedding corpus, exact e4 integers
    "s_embed_drift" -> """WITH e AS (
  SELECT vec_id % 2 = 0 AS is_a,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS ve4
  FROM embeddings)
SELECT CAST(dim AS INT) AS dim,
       CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
       CAST(sum(CASE WHEN is_a THEN ve4[dim + 1] ELSE 0 END) AS BIGINT)
         // CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS mean_a_e4,
       CAST(sum(CASE WHEN is_a THEN 0 ELSE ve4[dim + 1] END) AS BIGINT)
         // CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS mean_b_e4,
       abs(CAST(sum(CASE WHEN is_a THEN ve4[dim + 1] ELSE 0 END) AS BIGINT)
             // CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
           - CAST(sum(CASE WHEN is_a THEN 0 ELSE ve4[dim + 1] END) AS BIGINT)
             // CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)) AS drift_e4
FROM e, unnest(range(0, 64)) AS r(dim)
GROUP BY dim""",

    // lag-1 autocorrelation of the daily-mean series: exact moments,
    // one mirrored double chain (the g_assortativity convention)
    "a_autocorr" -> """WITH daily AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
           // CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), p AS (
  SELECT event_type, x,
         lead(x) OVER (PARTITION BY event_type ORDER BY day) AS y
  FROM daily
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM p WHERE y IS NOT NULL GROUP BY 1)
SELECT event_type, n AS n_pairs,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
          sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
               (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS r1
FROM m""",

    // sqrt-free point-biserial feature ranking: exact scaled
    // covariance per embedding dim against the label < 5 target
    "s_feature_cov" -> """WITH e AS (
  SELECT CAST(label < 5 AS BIGINT) AS y,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS ve4
  FROM embeddings
), m AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ve4[dim + 1]) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(ve4[dim + 1] * y) AS BIGINT) AS sxy
  FROM e, unnest(range(0, 64)) AS r(dim)
  GROUP BY dim)
SELECT CAST(dim AS INT) AS dim, n, sx, sy,
       n * sxy - sx * sy AS cov_scaled,
       abs(n * sxy - sx * sy) AS abs_cov
FROM m ORDER BY abs_cov DESC, dim LIMIT 10""",

    // vocabulary novelty per ingestion batch: distinct types, first-
    // seen types, and the e4 novelty ratio
    "t_vocab_novelty" -> """WITH occ AS (
  SELECT doc_id // 100 AS batch, unnest(
    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                t -> len(t) > 0)) AS t
  FROM documents
), pbt AS (
  SELECT batch, t, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY 1, 2
), fb AS (SELECT t, min(batch) AS fb FROM pbt GROUP BY 1)
SELECT batch, CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN fb = batch THEN 1 ELSE 0 END) AS BIGINT) AS n_new_types,
       CAST(sum(CASE WHEN fb = batch THEN 1 ELSE 0 END) AS BIGINT) * 10000
         // CAST(count(*) AS BIGINT) AS novelty_e4
FROM pbt JOIN fb USING (t) GROUP BY 1""",

    // discrete churn hazard by streak age: risk/event counts exact,
    // last-day streaks censored
    "a_streak_hazard" -> """WITH days AS (
  SELECT DISTINCT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
  FROM events
), mx AS (SELECT max(day) AS max_day FROM days
), isl AS (
  SELECT user_id, day,
         day - dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
), st AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len, max(day) AS end_day
  FROM isl GROUP BY 1, 2
), hist AS (
  SELECT len, CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(CASE WHEN end_day < max_day THEN 1 ELSE 0 END) AS BIGINT) AS n_events
  FROM st CROSS JOIN mx GROUP BY 1)
SELECT len AS k,
       CAST(sum(n_total) OVER (ORDER BY len DESC) AS BIGINT) AS n_risk,
       n_events,
       n_events * 1000000
         // CAST(sum(n_total) OVER (ORDER BY len DESC) AS BIGINT) AS hazard_e6
FROM hist""",

    // ViT patch planning: stub dimensions from byte length, 128x128
    // tile fan-out with clipped edge tiles
    "m_tile_grid" -> """WITH dims AS (
  SELECT doc_id AS asset_id,
         64 + CAST(strlen(text) AS BIGINT) % 512 AS width,
         64 + (CAST(strlen(text) AS BIGINT) // 7) % 512 AS height
  FROM documents)
SELECT asset_id, tx, ty, tx * 128 AS x0, ty * 128 AS y0,
       least(128, width - tx * 128) AS w,
       least(128, height - ty * 128) AS h
FROM dims,
     unnest(range(0, (width - 1) // 128 + 1)) AS rx(tx),
     unnest(range(0, (height - 1) // 128 + 1)) AS ry(ty)""",

    // Markov stationary distribution: eight exact e6 power steps over
    // the a_transitions matrix, replayed in a recursive CTE
    "a_markov_stationary" -> """WITH RECURSIVE tr AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT event_type AS from_type,
           lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS to_type
    FROM events)
  WHERE to_type IS NOT NULL GROUP BY 1, 2
), p AS (
  SELECT from_type, to_type,
         n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS p_e6
  FROM tr
), it AS (
  SELECT 0 AS k, t, CAST(1000000 AS BIGINT) AS v FROM (
    SELECT from_type AS t FROM p UNION SELECT to_type FROM p)
  UNION ALL
  SELECT k + 1, to_type AS t, CAST(sv AS BIGINT) AS v FROM (
    SELECT it.k AS k, p.to_type AS to_type,
           sum((it.v * p.p_e6) // 1000000) AS sv
    FROM it JOIN p ON p.from_type = it.t
    WHERE it.k < 8 GROUP BY 1, 2)
)
SELECT t AS event_type, v AS v_e6 FROM it WHERE k = 8""",

    // aspect-ratio bucketing: nine-step ladder, nearest bucket by the
    // fixed-pointed rational |w/h - bw/bh|, ties to the lower id
    "m_aspect_bucket" -> """WITH dims AS (
  SELECT doc_id AS asset_id,
         64 + CAST(strlen(text) AS BIGINT) % 512 AS width,
         64 + (CAST(strlen(text) AS BIGINT) // 7) % 512 AS height
  FROM documents
), buckets AS (
  SELECT CAST(bucket_id AS BIGINT) AS bucket_id, CAST(bw AS BIGINT) AS bw,
         CAST(bh AS BIGINT) AS bh
  FROM (VALUES (1, 256, 1024), (2, 320, 832), (3, 384, 704),
    (4, 448, 576), (5, 512, 512), (6, 576, 448), (7, 704, 384),
    (8, 832, 320), (9, 1024, 256)) AS b(bucket_id, bw, bh)
), scored AS (
  SELECT asset_id, bucket_id, bw, bh,
         abs(width * bh - height * bw) * 1048576 // bh AS score,
         row_number() OVER (PARTITION BY asset_id
           ORDER BY abs(width * bh - height * bw) * 1048576 // bh, bucket_id)
           AS rn
  FROM dims CROSS JOIN buckets)
SELECT bucket_id, bw, bh, CAST(count(*) AS BIGINT) AS n_assets,
       CAST(sum(score) AS BIGINT) AS score_sum
FROM scored WHERE rn = 1 GROUP BY 1, 2, 3""",

    // ABC / Pareto classification on the 4096-bucket quantized revenue
    // histogram; boundaries by integer cross-multiplication
    "a_pareto" -> """WITH rev AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
             (100 - CAST(round(l_discount * 100) AS BIGINT))) AS x
  FROM lineitem GROUP BY 1
), mx AS (SELECT max(x) AS mx FROM rev
), bucketed AS (
  SELECT x * 4096 // (mx + 1) AS b, CAST(count(*) AS BIGINT) AS c,
         sum(x) AS bx
  FROM rev CROSS JOIN mx GROUP BY 1
), cum AS (
  SELECT b, c, bx,
         COALESCE(sum(bx) OVER (ORDER BY b DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev,
         sum(bx) OVER () AS t
  FROM bucketed)
SELECT CASE WHEN cum_prev * 100 < t * 80 THEN 'A'
            WHEN cum_prev * 100 < t * 95 THEN 'B' ELSE 'C' END AS abc,
       CAST(sum(c) AS BIGINT) AS n_parts, CAST(sum(bx) AS BIGINT) AS rev_fx,
       round(CAST(sum(bx) AS DOUBLE) / max(t), 6) AS share
FROM cum GROUP BY 1""",

    // inter-purchase gap-days histogram with exact e6 CDF
    "a_interpurchase" -> """WITH d AS (
  SELECT o_custkey, o_orderkey,
         epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day
  FROM orders
), gaps AS (
  SELECT day - lag(day, 1) OVER (PARTITION BY o_custkey
           ORDER BY day, o_orderkey) AS gap_days
  FROM d
), hist AS (
  SELECT gap_days, CAST(count(*) AS BIGINT) AS n FROM gaps
  WHERE gap_days IS NOT NULL GROUP BY 1)
SELECT gap_days, n,
       CAST(sum(n) OVER (ORDER BY gap_days) AS BIGINT) * 1000000
         // CAST(sum(n) OVER () AS BIGINT) AS cdf_e6
FROM hist""",

    // pairwise Jensen-Shannon divergence between source unigram
    // distributions, entropy form H(M) - (H(P)+H(Q))/2
    "t_js_divergence" -> s"""WITH occ AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS t
  FROM documents
), st AS (SELECT source, t, count(*) AS c_st FROM occ GROUP BY 1, 2),
ns AS (SELECT source, sum(c_st) AS n_s FROM st GROUP BY 1),
sp AS (
  SELECT source, t, CAST(c_st AS DOUBLE) / n_s AS p
  FROM st JOIN ns USING (source)
), pairs AS (
  SELECT a.source AS s1, b.source AS s2
  FROM ns a, ns b WHERE a.source < b.source
), pertok AS (
  SELECT s1, s2, t, sum(p) / 2.0 AS m,
         sum(CASE WHEN source = s1 THEN -p * ln(p) ELSE 0 END) AS h1t,
         sum(CASE WHEN source = s2 THEN -p * ln(p) ELSE 0 END) AS h2t
  FROM sp JOIN pairs ON source = s1 OR source = s2
  GROUP BY 1, 2, 3)
SELECT s1, s2,
       round(sum(-m * ln(m)) - (sum(h1t) + sum(h2t)) / 2.0, 4) AS jsd
FROM pertok GROUP BY 1, 2""",

    // top-20 revenue leaderboard churn between calendar halves;
    // absent ranks coalesce to 21
    "a_rank_churn" -> """WITH rev AS (
  SELECT CASE WHEN o_orderdate >= TIMESTAMP '1995-06-01' THEN 1 ELSE 0 END
           AS period,
         l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
             (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), ranked AS (
  SELECT period, l_partkey,
         CAST(row_number() OVER (PARTITION BY period
           ORDER BY rev DESC, l_partkey) AS INT) AS r
  FROM rev
), t AS (SELECT * FROM ranked WHERE r <= 20),
p0 AS (SELECT l_partkey, r AS r0 FROM t WHERE period = 0),
p1 AS (SELECT l_partkey, r AS r1 FROM t WHERE period = 1)
SELECT COALESCE(p0.l_partkey, p1.l_partkey) AS l_partkey, r0, r1,
       CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL THEN 'stayed'
            WHEN r0 IS NOT NULL THEN 'exited' ELSE 'entered' END AS status,
       COALESCE(r0, 21) - COALESCE(r1, 21) AS rank_delta
FROM p0 FULL OUTER JOIN p1 ON p0.l_partkey = p1.l_partkey""",

    // scene cuts: 8 stub frames per asset, 56-bit fingerprints, cut
    // where consecutive hashes differ in >= 24 bits
    "m_scene_cut" -> s"""WITH fr AS (
  SELECT doc_id AS asset_id, CAST(i AS BIGINT) AS frame_idx,
         ${dh("substr(text, CAST((i * CAST(length(text) AS BIGINT)) // 8 AS INT) + 1, 8)")} AS h
  FROM documents, range(0, 8) t(i)
), d AS (
  SELECT asset_id, frame_idx,
         xor(h, lag(h, 1) OVER (PARTITION BY asset_id ORDER BY frame_idx)) AS x
  FROM fr
), dd AS (
  SELECT asset_id, frame_idx, bit_count(x) AS dist FROM d WHERE x IS NOT NULL)
SELECT asset_id, CAST(count(*) AS BIGINT) AS n_trans,
       CAST(sum(CASE WHEN dist >= 24 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       CAST(max(dist) AS INT) AS max_dist,
       min(CASE WHEN dist >= 24 THEN frame_idx END) AS first_cut_idx
FROM dd GROUP BY 1""",

    // monthly new-vs-returning revenue: "new" = order inside the
    // customer's first-ever month
    "a_repeat_revenue" -> """WITH ord AS (
  SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS mon,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rev_fx
  FROM orders
), fm AS (SELECT o_custkey, min(mon) AS first_mon FROM ord GROUP BY 1)
SELECT epoch_us(mon) AS mon_us,
       CAST(sum(CASE WHEN mon = first_mon THEN rev_fx ELSE 0 END) AS BIGINT)
         AS new_rev_fx,
       CAST(sum(CASE WHEN mon = first_mon THEN 0 ELSE rev_fx END) AS BIGINT)
         AS repeat_rev_fx,
       CAST(sum(CASE WHEN mon = first_mon THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN mon = first_mon THEN 0 ELSE 1 END) AS BIGINT) AS n_repeat,
       round(CAST(sum(CASE WHEN mon = first_mon THEN 0 ELSE rev_fx END) AS DOUBLE)
             / sum(rev_fx), 6) AS repeat_share
FROM ord JOIN fm USING (o_custkey)
GROUP BY 1""",

    // cohort LTV curve: cumulative cohort revenue over week offsets,
    // truncating per-customer cent division
    "a_cohort_ltv" -> """WITH ord AS (
  SELECT o_custkey, date_trunc('week', CAST(o_orderdate AS TIMESTAMP)) AS wk,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rev_fx
  FROM orders
), cohorts AS (SELECT o_custkey, min(wk) AS cw FROM ord GROUP BY 1
), sizes AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_c FROM cohorts GROUP BY 1
), rev AS (
  SELECT cw, CAST(date_diff('day', cw, wk) // 7 AS BIGINT) AS week_offset,
         sum(rev_fx) AS rev_fx
  FROM ord JOIN cohorts USING (o_custkey)
  GROUP BY 1, 2)
SELECT epoch_us(cw) AS cohort_week_us, week_offset, n_c,
       CAST(rev_fx AS BIGINT) AS rev_fx,
       CAST(sum(rev_fx) OVER (PARTITION BY cw ORDER BY week_offset) AS BIGINT)
         AS cum_rev_fx,
       CAST(sum(rev_fx) OVER (PARTITION BY cw ORDER BY week_offset) AS BIGINT)
         // n_c AS ltv_pc_fx
FROM rev JOIN sizes USING (cw)""",

    // seasonal-naive backtest: forecast = value 7 calendar days ago
    // (self-join, gap-safe), exact fixed-point error rollup
    "a_seasonal_naive" -> """WITH daily AS (
  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         sum(CAST(round(value * 10000) AS BIGINT)) AS x
  FROM events GROUP BY 1, 2
), j AS (
  SELECT a.event_type, a.x - f.x AS err
  FROM daily a JOIN daily f
    ON a.event_type = f.event_type AND f.day = a.day - 7)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_backtest,
       CAST(sum(abs(err)) AS BIGINT) AS sum_abs_err,
       CAST(max(abs(err)) AS BIGINT) AS max_abs_err,
       CAST(sum(err) AS BIGINT) AS bias,
       CAST(sum(abs(err)) AS BIGINT) // count(*) AS mae_fx
FROM j GROUP BY 1""",

    // PSI model-drift audit: parity split, e4-integer decile buckets,
    // add-one smoothing, per-bucket (pa-pe)*ln(pa/pe) terms
    "s_psi" -> s"""WITH scored AS (
  SELECT vec_id,
         CAST(round(10000.0 / (1.0 + exp(-(list_dot_product(
           list_transform(embedding, x -> CAST(x AS DOUBLE)),
           [${graft.SparkEntry.ModelWeights.mkString(", ")}]) + 0.1)))) AS BIGINT)
           AS p4
  FROM embeddings
), b AS (
  SELECT CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS is_exp,
         least(p4 // 1000, 9) AS bucket
  FROM scored
), agg AS (
  SELECT bucket, CAST(sum(is_exp) AS BIGINT) AS c_exp,
         CAST(sum(1 - is_exp) AS BIGINT) AS c_act
  FROM b GROUP BY 1
), t AS (
  SELECT bucket, c_exp, c_act,
         CAST(sum(c_exp) OVER () AS BIGINT) AS n_exp,
         CAST(sum(c_act) OVER () AS BIGINT) AS n_act
  FROM agg)
SELECT bucket, c_exp, c_act,
       round((CAST(c_act + 1 AS DOUBLE) / (n_act + 10) -
              CAST(c_exp + 1 AS DOUBLE) / (n_exp + 10)) *
             ln((CAST(c_act + 1 AS DOUBLE) / (n_act + 10)) /
                (CAST(c_exp + 1 AS DOUBLE) / (n_exp + 10))), 6) AS term
FROM t""",

    // 128 MiB output-layout advisor under declared row-size formulas
    "p_file_plan" -> """WITH e AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(32 + length(event_type) + length(props)) AS BIGINT)
           AS est_bytes
  FROM events
), d AS (
  SELECT CAST(count(*) AS BIGINT),
         CAST(sum(16 + length(text) + length(lang) + length(source)) AS BIGINT)
  FROM documents
), l AS (
  SELECT CAST(count(*) AS BIGINT),
         CAST(sum(72 + length(l_returnflag) + length(l_linestatus)) AS BIGINT)
  FROM lineitem
), u AS (
  SELECT 'events' AS table_name, * FROM e
  UNION ALL SELECT 'documents', * FROM d
  UNION ALL SELECT 'lineitem', * FROM l)
SELECT table_name, n_rows, est_bytes,
       CAST(greatest(1, (est_bytes + 134217727) // 134217728) AS BIGINT)
         AS n_files,
       n_rows // CAST(greatest(1, (est_bytes + 134217727) // 134217728) AS BIGINT)
         AS rows_per_file
FROM u""",

    // centroid-classifier confusion matrix; diagonal rows carry exact
    // e4 recall (row marginal) and precision (column marginal)
    "s_confusion" -> s"""WITH vecs AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), cent AS (
  SELECT label AS c_label, $CENT_ARR AS c FROM vecs GROUP BY label
), scored AS (
  SELECT vec_id, label, c_label,
         list_dot_product(v, c) /
           (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c))) AS cos
  FROM vecs CROSS JOIN cent
), p AS (
  SELECT label, c_label AS pred FROM (
    SELECT vec_id, label, c_label,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_label) AS rnk
    FROM scored)
  WHERE rnk = 1
), cm AS (
  SELECT label, pred, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2)
SELECT label, pred, n,
       CASE WHEN label = pred THEN
         n * 10000 // CAST(sum(n) OVER (PARTITION BY label) AS BIGINT) END
         AS recall_e4,
       CASE WHEN label = pred THEN
         n * 10000 // CAST(sum(n) OVER (PARTITION BY pred) AS BIGINT) END
         AS precision_e4
FROM cm""",

    // n-gram diversity curve: the type/token ratio swept over n=1..5
    "t_diversity_curve" -> (s"""WITH toks AS (
  SELECT source,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk
  FROM documents
)
""" + (1 to 5).map(n => s"""SELECT CAST($n AS BIGINT) AS n, source,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
       round(CAST(count(DISTINCT g) AS DOUBLE) / count(*), 4) AS diversity
FROM (SELECT source, unnest(${shinglesN(n)}) AS g FROM toks) GROUP BY 2""")
      .mkString("\nUNION ALL\n")),

    // token-weighted dedup impact: non-keeper copies charge their
    // token count to their own source
    "d_dup_weight" -> s"""WITH docs AS (
  SELECT doc_id, source,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
           t -> len(t) > 0)) AS BIGINT) AS n_tok
  FROM documents
), d2 AS (
  SELECT doc_id, source, n_tok, ${dh("norm")} AS h,
         CAST(length(norm) AS BIGINT) AS ln
  FROM docs
), k AS (SELECT h, ln, min(doc_id) AS keeper FROM d2 GROUP BY 1, 2)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(sum(n_tok) AS BIGINT) AS tokens_total,
       CAST(sum(CASE WHEN doc_id <> keeper THEN n_tok ELSE 0 END) AS BIGINT)
         AS tokens_wasted,
       CAST(sum(CASE WHEN doc_id <> keeper THEN n_tok ELSE 0 END) AS BIGINT)
         * 1000000 // CAST(sum(n_tok) AS BIGINT) AS waste_e6
FROM d2 JOIN k USING (h, ln)
GROUP BY 1""",

    // Gini-Simpson token diversity per source, exact e6
    "t_simpson" -> s"""WITH occ AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS t
  FROM documents
), st AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c_st FROM occ GROUP BY 1, 2)
SELECT source, CAST(sum(c_st) AS BIGINT) AS n_tok,
       1000000 - CAST(sum(c_st * (c_st - 1)) AS BIGINT) * 1000000
         // (CAST(sum(c_st) AS BIGINT) * (CAST(sum(c_st) AS BIGINT) - 1))
         AS simpson_e6
FROM st GROUP BY 1""",

    // Wald-Wolfowitz runs test over daily-delta signs per event type;
    // zero deltas drop, z is one mirrored double chain
    "a_runs_test" -> """WITH daily AS (
  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         sum(CAST(round(value * 10000) AS BIGINT)) AS x
  FROM events GROUP BY 1, 2
), sg AS (
  SELECT event_type, day,
         CASE WHEN d > 0 THEN 1 ELSE -1 END AS sgn
  FROM (
    SELECT event_type, day,
           x - lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS d
    FROM daily)
  WHERE d IS NOT NULL AND d <> 0
), r AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_signs,
         CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
         CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_minus,
         CAST(sum(CASE WHEN prev_sgn IS NULL OR prev_sgn <> sgn THEN 1 ELSE 0 END)
           AS BIGINT) AS n_runs
  FROM (
    SELECT event_type, sgn,
           lag(sgn, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev_sgn
    FROM sg)
  GROUP BY 1)
SELECT event_type, n_signs, n_plus, n_minus, n_runs,
       round((n_runs - (1.0 + 2.0 * n_plus * n_minus / (n_plus + n_minus))) /
             sqrt((2.0 * n_plus * n_minus *
                   (2.0 * n_plus * n_minus - n_plus - n_minus)) /
                  ((n_plus + n_minus) * (n_plus + n_minus) *
                   (n_plus + n_minus - 1))), 4) AS z
FROM r""",

    // at-most-one-change localization: argmax |n*S_t - t*S_n| over the
    // daily series, ties to the earliest day
    "a_changepoint" -> """WITH daily AS (
  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         sum(CAST(round(value * 10000) AS BIGINT)) AS x
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, day,
         CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS st,
         CAST(count(*) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS t,
         CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS sn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
), d AS (
  SELECT event_type, day, n, n * st - t * sn AS dev,
         row_number() OVER (PARTITION BY event_type
           ORDER BY abs(n * st - t * sn) DESC, day) AS rn
  FROM c)
SELECT event_type, day AS tau_day, abs(dev) AS dev_abs,
       CASE WHEN dev > 0 THEN 'down' ELSE 'up' END AS shift_dir,
       n AS n_days
FROM d WHERE rn = 1""",

    // HITS: four exact e6 rounds over the DIRECTED purchase graph,
    // max-rescaled each phase, unrolled (the engine's own loop shape).
    // Rescale via max() OVER () so every CTE is referenced exactly
    // once — a scalar-subquery max would make DuckDB's CTE inlining
    // re-evaluate the whole chain exponentially.
    "g_hits" -> ("""WITH e AS (
  SELECT o_custkey AS c, l_suppkey AS p, CAST(count(*) AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2
), h0 AS (SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS h FROM e)""" +
      (1 to 4).map(i => s""",
a$i AS (SELECT p, ar * 1000000 // max(ar) OVER () AS a FROM (
  SELECT p, CAST(sum(w * h) AS BIGINT) AS ar
  FROM e JOIN h${i - 1} USING (c) GROUP BY 1)),
h$i AS (SELECT c, hr * 1000000 // max(hr) OVER () AS h FROM (
  SELECT c, CAST(sum(w * a) AS BIGINT) AS hr
  FROM e JOIN a$i USING (p) GROUP BY 1))""")
        .mkString + """
SELECT 's' || CAST(p AS VARCHAR) AS node, a AS score_e6, 'authority' AS kind
FROM a4
UNION ALL
SELECT 'c' || CAST(c AS VARCHAR), h, 'hub' FROM h4"""),

    // Mass-conserving Markov stationary: eight unrolled e6 power
    // steps; each step's leak (sink outflow + truncation) is derived
    // from the conserved-total invariant ns*1e6 and redistributed
    // uniformly with the remainder pinned to min(t). Unrolled (not
    // recursive) because each step needs a full-frame window total
    // and a left join against the state dimension. The chain is
    // shared with a_markov_entropy via MARKOV_V8.
    "a_markov_conserve" -> (MARKOV_V8 + """
SELECT t AS event_type, v AS v_e6 FROM v8"""),

    // entropy rate of the journey chain: per-state conditional
    // entropy of the quantized e6 matrix (p_e6 > 0 support, shared
    // with the engine), weighted by the CONSERVED stationary vector;
    // sinks carry h = 0 by convention
    "a_markov_entropy" -> (MARKOV_V8 + """,
h AS (
  SELECT from_type AS event_type,
         -sum((p_e6 / 1e6) * ln(p_e6 / 1e6)) AS h_raw
  FROM p WHERE p_e6 > 0 GROUP BY 1
), vt AS (
  SELECT t AS event_type, v, CAST(sum(v) OVER () AS BIGINT) AS v_tot
  FROM v8)
SELECT vt.event_type, v AS pi_e6,
       round(coalesce(h_raw, 0), 4) AS h_cond_nats,
       round(coalesce(h_raw, 0) * v / v_tot, 4) AS contrib_nats
FROM vt LEFT JOIN h USING (event_type)"""),

    // FD audit: A -> B holds iff ndv(A) = ndv(A,B); one grouped
    // countDistinct pass per declared pair
    "p_fd_audit" -> {
      def fd(tbl: String, a: String, b: String): String =
        s"""SELECT '$tbl' AS tbl, '$a' AS lhs, '$b' AS rhs,
  CAST(count(*) AS BIGINT) AS ndv_lhs,
  CAST(sum(k) AS BIGINT) AS ndv_pair,
  sum(k) = count(*) AS fd_holds
FROM (SELECT $a, count(DISTINCT $b) AS k FROM $tbl GROUP BY $a)"""
      Seq(
        fd("nation", "n_name", "n_regionkey"),
        fd("orders", "o_orderkey", "o_custkey"),
        fd("part", "p_brand", "p_type"),
        fd("part", "p_name", "p_brand"),
        fd("documents", "source", "lang"),
        fd("customer", "c_mktsegment", "c_nationkey"),
        fd("lineitem", "l_returnflag", "l_linestatus"))
        .mkString("\nUNION ALL\n")
    },

    // PII exposure report: one scan, ten aggregates, stacked per
    // class; patterns shared with the engine as constants
    "e_pii_report" -> {
      val classes = Seq(
        "email" -> graft.ext.TextOps.EmailPat,
        "url" -> graft.ext.TextOps.UrlPat,
        "phone" -> graft.ext.TextOps.PhonePat,
        "ssn" -> graft.ext.TextOps.SsnPat,
        "ipv4" -> graft.ext.TextOps.Ipv4Pat)
      val aggCols = classes.map { case (n, p) =>
        s"""CAST(sum(CASE WHEN len(regexp_extract_all(text, '$p')) > 0
           THEN 1 ELSE 0 END) AS BIGINT) AS ${n}_docs,
    CAST(sum(len(regexp_extract_all(text, '$p'))) AS BIGINT) AS ${n}_hits"""
      }.mkString(",\n    ")
      val arms = classes.map { case (n, _) =>
        s"SELECT source, '$n' AS pii_class, ${n}_docs AS n_docs_hit, " +
          s"${n}_hits AS n_hits FROM agg"
      }.mkString("\nUNION ALL\n")
      s"WITH agg AS (\n  SELECT source,\n    $aggCols\n  FROM documents GROUP BY source)\n$arms"
    },

    // license-marker audit: shared literal patterns over lowercased
    // text, ten aggregates in one scan then the per-class stack
    "e_license_audit" -> {
      val aggCols = graft.SparkEntry.LicensePats.map { case (n, p) =>
        s"""CAST(sum(CASE WHEN len(regexp_extract_all(lower(text), '$p')) > 0
           THEN 1 ELSE 0 END) AS BIGINT) AS ${n}_docs,
    CAST(sum(len(regexp_extract_all(lower(text), '$p'))) AS BIGINT) AS ${n}_hits"""
      }.mkString(",\n    ")
      val arms = graft.SparkEntry.LicensePats.map { case (n, _) =>
        s"SELECT source, '$n' AS license_class, ${n}_docs AS n_docs_hit, " +
          s"${n}_hits AS n_hits FROM agg"
      }.mkString("\nUNION ALL\n")
      s"WITH agg AS (\n  SELECT source,\n    $aggCols\n  FROM documents GROUP BY source)\n$arms"
    },

    // cross-source duplicate flow: the LSH-verified pair frame rolled
    // up to (source, source) cells, ordered pairs folded
    "e_dup_flow" -> (LSH_PAIRS + """,
f AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM pairs
  JOIN documents da ON pairs.doc_a = da.doc_id
  JOIN documents db ON pairs.doc_b = db.doc_id)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM f GROUP BY 1, 2"""),

    // landmark harmonic centrality: per-seed BFS labels carried
    // through the same recursive iterate as g_bfs, then one rollup
    "g_harmonic" -> """WITH RECURSIVE cs AS (
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
         's' || CAST(l.l_suppkey AS VARCHAR) AS snode
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT cnode AS src, snode AS dst FROM cs
  UNION ALL SELECT snode AS src, cnode AS dst FROM cs
), e2 AS (
  SELECT src, dst, CAST(1 AS BIGINT) AS delta FROM e
  UNION ALL SELECT src AS src, src AS dst, CAST(0 AS BIGINT) AS delta
  FROM (SELECT DISTINCT src FROM e)
), sd AS (
  SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
  FROM supplier WHERE s_nationkey = 0
), st AS (
  SELECT 0 AS t, node AS seed, node, CAST(0 AS BIGINT) AS dist FROM sd
  UNION ALL
  SELECT t + 1, seed, dst AS node, d AS dist FROM (
    SELECT st.t AS t, st.seed AS seed, e2.dst AS dst,
           min(st.dist + e2.delta) AS d
    FROM st JOIN e2 ON e2.src = st.node
    WHERE st.t < 3 GROUP BY 1, 2, 3)
)
SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
       CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_e6,
       max(dist) AS ecc_ball
FROM st WHERE t = 3 AND dist >= 1
GROUP BY seed""",

    // perceptual-hash dedup: the oracle is the all-pairs join the
    // pigeonhole banding provably equals at the declared radius
    // 63-bit DCT perceptual hash: the SAME e6 basis literals the
    // engine compiled in (no transcendental is evaluated by either
    // engine), two integer matrix multiplies, med2 threshold over the
    // 63 AC coefficients
    "m_dct_hash" -> s"$DCT_FP\nSELECT doc_id, h AS dct_hash FROM fp",

    // banded-join twin checked against the naive all-pairs Hamming
    // filter (the m_ahash_dedup oracle convention)
    "m_dct_neardup" -> s"""$DCT_FP
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= 6""",

    "m_ahash_dedup" -> """WITH px AS (
  SELECT doc_id,
         list_transform(range(0, 60), i ->
           CAST(ascii(substr(text,
             CAST(1 + (i * length(text)) // 60 AS INT), 1)) AS BIGINT)) AS p
  FROM documents WHERE length(text) >= 1
), ps AS (
  SELECT doc_id, p, list_aggregate(p, 'sum') AS sp FROM px
), fp AS (
  SELECT doc_id, CAST(list_aggregate(list_transform(range(0, 60), i ->
    CASE WHEN p[CAST(i + 1 AS INT)] * 60 > sp
         THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
         ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT) AS h
  FROM ps
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= 6""",

    // bucket advisor: exact per-key stats, smallest power of two with
    // >= 64Ki rows per bucket via the 31-row ladder, 5% hot-key flag
    "p_bucket_advisor" -> """WITH k1 AS (
  SELECT count(*) AS n FROM lineitem GROUP BY l_partkey
), k2 AS (SELECT count(*) AS n FROM lineitem GROUP BY l_suppkey
), k3 AS (SELECT count(*) AS n FROM orders GROUP BY o_custkey
), k4 AS (SELECT count(*) AS n FROM events GROUP BY user_id
), st AS (
  SELECT 'lineitem' AS tbl, 'l_partkey' AS join_key,
         CAST(sum(n) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS ndv,
         CAST(max(n) AS BIGINT) AS max_freq FROM k1
  UNION ALL
  SELECT 'lineitem', 'l_suppkey', CAST(sum(n) AS BIGINT),
         CAST(count(*) AS BIGINT), CAST(max(n) AS BIGINT) FROM k2
  UNION ALL
  SELECT 'orders', 'o_custkey', CAST(sum(n) AS BIGINT),
         CAST(count(*) AS BIGINT), CAST(max(n) AS BIGINT) FROM k3
  UNION ALL
  SELECT 'events', 'user_id', CAST(sum(n) AS BIGINT),
         CAST(count(*) AS BIGINT), CAST(max(n) AS BIGINT) FROM k4
), ladder AS (
  SELECT CAST(1 AS BIGINT) << CAST(i AS INT) AS p FROM range(0, 31) t(i)
)
SELECT tbl, join_key, n_rows, ndv, max_freq,
       CAST(min(p) AS BIGINT) AS buckets,
       max_freq * 20 > n_rows AS hot_key
FROM st JOIN ladder ON p >= (n_rows + 65535) // 65536
GROUP BY tbl, join_key, n_rows, ndv, max_freq""",

    // Poisson bootstrap: multiplicities from portable-hash thresholds,
    // replicate means in exact cents*100, order-statistic CI
    "a_bootstrap_ci" -> s"""WITH ord AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), draws AS (
  SELECT cents,
         CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1
              WHEN h < 9197 THEN 2 WHEN h < 9810 THEN 3
              WHEN h < 9963 THEN 4 ELSE 5 END AS mult, b
  FROM (
    SELECT cents, b,
           ${dh("CAST(o_orderkey AS VARCHAR) || '#' || CAST(b AS VARCHAR)")}
             % 10000 AS h
    FROM ord, range(1, 33) r(b))
), m AS (
  SELECT b, sum(mult) AS n_b, sum(mult * cents) AS sum_b
  FROM draws GROUP BY b
), mm AS (
  SELECT CAST(sum_b * 100 // n_b AS BIGINT) AS mean_c100 FROM m WHERE n_b > 0
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_resamples,
         list_sort(list(mean_c100)) AS ms
  FROM mm
), f AS (
  SELECT CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) * 100 // count(*) AS BIGINT) AS mean_full_c100
  FROM ord)
SELECT f.n_orders, f.mean_full_c100, g.n_resamples,
       CAST(ms[2] AS BIGINT) AS ci_lo_c100,
       CAST(ms[CAST(len(ms) - 1 AS INT)] AS BIGINT) AS ci_hi_c100
FROM g CROSS JOIN f""",

    // Mann-Kendall: exact S and tie-corrected var18, one rounded z;
    // the verdict compares the ROUNDED z so both engines cut alike
    "a_mann_kendall" -> """WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         sum(CAST(round(value * 10000) AS BIGINT)) AS x
  FROM events GROUP BY 1, 2
), sp AS (
  SELECT a.event_type AS event_type,
         CAST(sum(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
), nd AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1
), tt AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, x, count(*) AS t FROM daily GROUP BY 1, 2)
  WHERE t > 1 GROUP BY 1
), m AS (
  SELECT nd.event_type, nd.n, sp.s_stat,
         nd.n * (nd.n - 1) * (2 * nd.n + 5) - coalesce(tt.tie_term, 0)
           AS var18
  FROM nd JOIN sp ON nd.event_type = sp.event_type
  LEFT JOIN tt ON nd.event_type = tt.event_type
), z AS (
  SELECT event_type, n, s_stat, CAST(var18 AS BIGINT) AS var18,
         round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var18 / 18.0)
                    WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var18 / 18.0)
                    ELSE 0.0 END, 4) AS z
  FROM m)
SELECT event_type, n AS n_days, s_stat, var18, z,
       CASE WHEN z > 1.96 THEN 'up'
            WHEN z < -1.96 THEN 'down' ELSE 'none' END AS trend
FROM z""",

    // Theil–Sen: doubled median of all pairwise e6 slopes per series;
    // // and div both truncate toward zero so negatives replay
    "a_theil_sen" -> """WITH daily0 AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         sum(CAST(round(value * 10000) AS BIGINT)) AS x
  FROM events GROUP BY 1, 2
), daily AS (
  SELECT event_type, day - min(day) OVER (PARTITION BY event_type) AS d, x
  FROM daily0
), pr AS (
  SELECT a.event_type AS event_type,
         (b.x - a.x) * 1000000 // (b.d - a.d) AS slope_e6
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
         list_sort(list(slope_e6)) AS sl
  FROM pr GROUP BY 1
), sm AS (
  SELECT event_type, n_pairs,
         CAST(sl[CAST((len(sl) + 1) // 2 AS INT)] +
              sl[CAST((len(sl) + 2) // 2 AS INT)] AS BIGINT) AS s2
  FROM g
), iv AS (
  SELECT d.event_type, sm.n_pairs, sm.s2,
         list_sort(list(2 * 1000000 * d.x - sm.s2 * d.d)) AS wl
  FROM daily d JOIN sm ON d.event_type = sm.event_type
  GROUP BY 1, 2, 3)
SELECT event_type, n_pairs, s2 AS slope_med2_e6,
       CAST(wl[CAST((len(wl) + 1) // 2 AS INT)] +
            wl[CAST((len(wl) + 2) // 2 AS INT)] AS BIGINT) AS icept_med4_e6
FROM iv""",

    // TextRank: the g_pagerank recursive replay over the symmetrized
    // co-occurrence graph (combined weight >= 3), top 20 by rank.
    // RECURSIVE must ride the one WITH, hence the rewrite of TOKS.
    "t_textrank" -> s"""${TOKS.replaceFirst("WITH ", "WITH RECURSIVE ")}, occ AS (
  SELECT unnest(${shinglesN(2)}) AS s FROM toks
), pw AS (
  SELECT string_split(s, ' ')[1] AS u1, string_split(s, ' ')[2] AS u2
  FROM occ
), und AS (
  SELECT least(u1, u2) AS a, greatest(u1, u2) AS b,
         CAST(count(*) AS BIGINT) AS w
  FROM pw WHERE u1 <> u2 GROUP BY 1, 2 HAVING count(*) >= 3
), e AS (
  SELECT a AS src, b AS dst, w FROM und
  UNION ALL SELECT b AS src, a AS dst, w FROM und
), ow AS (SELECT src, sum(w) AS wout FROM e GROUP BY src
), pr AS (
  SELECT 0 AS t, src AS node, CAST(1000000 AS BIGINT) AS p
  FROM (SELECT DISTINCT src FROM e)
  UNION ALL
  SELECT t+1, dst AS node, CAST(150000 + (85 * sm) // 100 AS BIGINT) AS p
  FROM (
    SELECT pr.t AS t, e.dst AS dst, sum((pr.p * e.w) // ow.wout) AS sm
    FROM pr JOIN e ON e.src = pr.node JOIN ow ON ow.src = pr.node
    WHERE pr.t < 4 GROUP BY 1, 2)
)
SELECT node AS token, p AS pr_fx FROM pr WHERE t = 4
ORDER BY p DESC, node LIMIT 20""",

    // per-doc TextRank: the g_pagerank recursion keyed (doc_id, tok),
    // top 3 per doc by (rank desc, token)
    "t_textrank_doc" -> s"""${TOKS.replaceFirst("WITH ", "WITH RECURSIVE ")}, occ AS (
  SELECT doc_id, unnest(${shinglesN(2)}) AS s FROM toks
), pw AS (
  SELECT doc_id, string_split(s, ' ')[1] AS u1, string_split(s, ' ')[2] AS u2
  FROM occ
), und AS (
  SELECT doc_id, least(u1, u2) AS a, greatest(u1, u2) AS b,
         CAST(count(*) AS BIGINT) AS w
  FROM pw WHERE u1 <> u2 GROUP BY 1, 2, 3
), e AS (
  SELECT doc_id, a AS src, b AS dst, w FROM und
  UNION ALL SELECT doc_id, b AS src, a AS dst, w FROM und
), ow AS (SELECT doc_id, src, sum(w) AS wout FROM e GROUP BY 1, 2
), pr AS (
  SELECT 0 AS t, doc_id, src AS tok, CAST(1000000 AS BIGINT) AS p
  FROM (SELECT DISTINCT doc_id, src FROM e)
  UNION ALL
  SELECT t + 1, doc_id, dst AS tok,
         CAST(150000 + (85 * sm) // 100 AS BIGINT) AS p
  FROM (
    SELECT pr.t AS t, e.doc_id AS doc_id, e.dst AS dst,
           sum((pr.p * e.w) // ow.wout) AS sm
    FROM pr JOIN e ON e.doc_id = pr.doc_id AND e.src = pr.tok
    JOIN ow ON ow.doc_id = e.doc_id AND ow.src = e.src
    WHERE pr.t < 4 GROUP BY 1, 2, 3)
), fin AS (
  SELECT doc_id, tok, p,
         row_number() OVER (PARTITION BY doc_id ORDER BY p DESC, tok) AS rnk
  FROM pr WHERE t = 4)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok AS token, p AS pr_fx
FROM fin WHERE rnk <= 3""",

    // trigram LM cross-entropy: add-one-smoothed p(w3|w1 w2), context
    // key sliced from the shingle string (mirror of
    // TextOps.trigramCrossEntropy)
    "t_trigram_ppl" -> s"""$TOKS, occ AS (
  SELECT doc_id, unnest(${shinglesN(3)}) AS s FROM toks
), c3 AS (SELECT s, count(*) AS c3 FROM occ GROUP BY s
), c12 AS (
  SELECT array_to_string(string_split(s, ' ')[1:2], ' ') AS w12,
         sum(c3) AS c12
  FROM c3 GROUP BY 1
), v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(tk) AS t FROM toks)
), model AS (
  SELECT c3.s, ln(CAST(c3.c3 + 1 AS DOUBLE) / (c12.c12 + v.v)) AS logp
  FROM c3 JOIN c12
    ON array_to_string(string_split(c3.s, ' ')[1:2], ' ') = c12.w12
  CROSS JOIN v
)
SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       round(-sum(m.logp) / count(*), 4) AS xent_nats
FROM occ JOIN model m USING (s)
GROUP BY occ.doc_id""",

    // local clustering coefficient over the LSH near-dup pair graph:
    // the oracle enumerates each triangle once id-oriented (a<b<c) and
    // explodes its three corners — a different apex per triangle than
    // the engine's degree orientation, the same corner multiset
    "g_clustering_coeff" -> s"""$LSH_PAIRS, ed AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
), deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM ed UNION ALL SELECT b FROM ed)
  GROUP BY 1
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ed e1 JOIN ed e2 ON e2.a = e1.b
  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b
), pn AS (
  SELECT node, count(*) AS n_tri FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri)
  GROUP BY 1
)
SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
       CAST(coalesce(pn.n_tri, 0) AS BIGINT) AS n_tri,
       CAST((coalesce(pn.n_tri, 0) * 20000) // (d.degree * (d.degree - 1))
            AS BIGINT) AS cc_e4
FROM deg d LEFT JOIN pn ON pn.node = d.node
WHERE d.degree >= 2""",

    // Newman modularity of the label-propagation communities: the
    // g_communities recursive iterate replayed, then two joins + one
    // community agg + the 1-row total, all truncating integer
    // arithmetic in e6
    "g_modularity" -> """WITH RECURSIVE cs AS (
  SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
         's' || CAST(l.l_suppkey AS VARCHAR) AS snode, count(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), e AS (
  SELECT cnode AS src, snode AS dst, w FROM cs
  UNION ALL SELECT snode AS src, cnode AS dst, w FROM cs
), lp AS (
  SELECT 0 AS t, node, node AS label FROM (
    SELECT DISTINCT src AS node FROM e
    UNION SELECT DISTINCT dst FROM e)
  UNION ALL
  SELECT t+1, dst AS node, label FROM (
    SELECT t, dst, label,
           row_number() OVER (PARTITION BY t, dst ORDER BY cnt DESC, label) AS rn
    FROM (
      SELECT lp.t AS t, e.dst AS dst, lp.label AS label, sum(e.w) AS cnt
      FROM lp JOIN e ON e.src = lp.node
      WHERE lp.t < 4 GROUP BY 1, 2, 3))
  WHERE rn = 1
), c4 AS (SELECT node, label AS community FROM lp WHERE t = 4
), mw AS (SELECT CAST(sum(w) AS BIGINT) AS m_w FROM e
), lab AS (
  SELECT e.w, c1.community AS c_src, c2.community AS c_dst
  FROM e JOIN c4 c1 ON c1.node = e.src JOIN c4 c2 ON c2.node = e.dst
), byc AS (
  SELECT c_src AS community, CAST(sum(w) AS BIGINT) AS k_w,
         CAST(sum(CASE WHEN c_src = c_dst THEN w ELSE 0 END) AS BIGINT)
           AS intra_w
  FROM lab GROUP BY 1
), nn AS (SELECT community, count(*) AS n_nodes FROM c4 GROUP BY 1)
SELECT byc.community, CAST(nn.n_nodes AS BIGINT) AS n_nodes,
       intra_w, k_w,
       CAST((intra_w * 1000000) // m_w
            - ((k_w * 1000000) // m_w) * ((k_w * 1000000) // m_w) // 1000000
            AS BIGINT) AS q_e6
FROM byc JOIN nn ON nn.community = byc.community CROSS JOIN mw""",

    // per-type freshness: global max as a 1-row cross join folded
    // through the per-type aggregate, exact microseconds
    "p_freshness" -> """WITH ev AS (
  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
), g AS (SELECT max(us) AS g_us FROM ev)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
       CAST(max(us) AS BIGINT) AS last_us,
       CAST(g_us - max(us) AS BIGINT) AS lag_us,
       CAST(sum(CASE WHEN us >= g_us - 86400000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_last_day,
       (g_us - max(us)) <= 21600000000 AS fresh_6h
FROM ev CROSS JOIN g
GROUP BY event_type, g_us""",

    // partition-skew advisor: fattest daily partition vs the mean in
    // exact e4, hot flag at 2x mean, ceil salt factor — all longs
    "p_partition_skew" -> """WITH files AS (
  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         count(*) AS n_part_rows
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_parts,
         CAST(sum(n_part_rows) AS BIGINT) AS n_rows,
         CAST(max(n_part_rows) AS BIGINT) AS max_part_rows
  FROM files GROUP BY 1)
SELECT event_type, n_parts, n_rows, max_part_rows,
       max_part_rows * n_parts * 10000 // n_rows AS skew_x_mean_e4,
       max_part_rows * n_parts > 2 * n_rows AS hot,
       CASE WHEN max_part_rows * n_parts > 2 * n_rows
            THEN (max_part_rows * n_parts + n_rows - 1) // n_rows
            ELSE 1 END AS salt_factor
FROM agg""",

    // compaction planner over the daily file model: small-file census
    // under 1 MiB + the 128 MiB-target rewrite, exact integers
    "p_compaction_plan" -> """WITH files AS (
  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         count(*) AS n_rows,
         CAST(sum(32 + length(event_type) + length(props)) AS BIGINT)
           AS est_bytes
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(n_rows) AS BIGINT) AS n_rows,
         CAST(sum(est_bytes) AS BIGINT) AS est_bytes,
         CAST(sum(CASE WHEN est_bytes < 1048576 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_small
  FROM files GROUP BY 1)
SELECT event_type, n_files, n_rows, est_bytes, n_small,
       greatest(1, (est_bytes + 134217727) // 134217728) AS n_files_target,
       n_files // greatest(1, (est_bytes + 134217727) // 134217728)
         AS merge_factor
FROM agg""",

    // ANALYZE-style column stats in one scan: exact ndv/null/min/max
    // per declared column, stacked as a catalog table
    "p_stats_profile" -> """WITH a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_id,
         CAST(count(DISTINCT event_id) AS BIGINT) AS ndv_id,
         CAST(min(event_id) AS BIGINT) AS mn_id,
         CAST(max(event_id) AS BIGINT) AS mx_id,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_uid,
         CAST(count(DISTINCT user_id) AS BIGINT) AS ndv_uid,
         CAST(min(user_id) AS BIGINT) AS mn_uid,
         CAST(max(user_id) AS BIGINT) AS mx_uid,
         CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ty,
         CAST(count(DISTINCT event_type) AS BIGINT) AS ndv_ty,
         min(event_type) AS mn_ty, max(event_type) AS mx_ty,
         CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_pr,
         CAST(count(DISTINCT props) AS BIGINT) AS ndv_pr,
         min(props) AS mn_pr, max(props) AS mx_pr
  FROM events)
SELECT 'event_id' AS col_name, n, nn_id AS n_null, ndv_id AS ndv,
       mn_id AS min_long, mx_id AS max_long,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM a
UNION ALL
SELECT 'user_id', n, nn_uid, ndv_uid, mn_uid, mx_uid,
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM a
UNION ALL
SELECT 'event_type', n, nn_ty, ndv_ty, CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), mn_ty, mx_ty FROM a
UNION ALL
SELECT 'props', n, nn_pr, ndv_pr, CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), mn_pr, mx_pr FROM a""",

    // retention planner: rows/bytes each type reclaims under the
    // declared 14-day policy measured from the freshest day
    "p_retention_plan" -> """WITH ev AS (
  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         32 + length(event_type) + length(props) AS row_bytes
  FROM events
), g AS (SELECT max(day) AS g_day FROM ev)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN day <= g_day - 14 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_expired,
       CAST(sum(CASE WHEN day <= g_day - 14 THEN row_bytes ELSE 0 END)
         AS BIGINT) AS bytes_reclaimed,
       CAST(count(*) - sum(CASE WHEN day <= g_day - 14 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_kept
FROM ev CROSS JOIN g
GROUP BY event_type""",

    // Flesch scores in e2: words from the shared token split,
    // sentences as [.!?]+ runs (min 1), syllables as per-token vowel
    // runs floored at 1; every score a sum of truncating divisions
    "t_readability" -> s"""$TOKS, c AS (
  SELECT doc_id, CAST(len(tk) AS BIGINT) AS w,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS sn,
         CAST(list_sum(list_transform(tk, t ->
           greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1))) AS BIGINT)
           AS y
  FROM toks WHERE len(tk) >= 1)
SELECT doc_id, w AS n_words, sn AS n_sentences, y AS n_syllables,
       CAST((100 * w) // sn AS BIGINT) AS wps_e2,
       CAST((100 * y) // w AS BIGINT) AS spw_e2,
       CAST((39 * w) // sn + (1180 * y) // w - 1559 AS BIGINT) AS fk_e2,
       CAST(20684 - (1015 * w) // (10 * sn) - (8460 * y) // w AS BIGINT)
         AS fre_e2
FROM c""",

    // reciprocity of the directed transition graph: weighted form is
    // Σ min(n_ab, n_ba) / Σ n; self-transitions excluded
    // degree histogram of the bipartite purchase graph with exact
    // cumulative node share; windows over the bounded histogram only
    "g_degree_dist" -> """WITH deg AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
  GROUP BY 1
), hist AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY 1)
SELECT degree, n_nodes,
       CAST(sum(n_nodes) OVER (ORDER BY degree
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_nodes,
       CAST(sum(n_nodes) OVER (ORDER BY degree
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000
         // sum(n_nodes) OVER () AS BIGINT) AS cum_share_e4
FROM hist""",

    "g_reciprocity" -> """WITH tr AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT event_type AS from_type,
           lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS to_type
    FROM events)
  WHERE to_type IS NOT NULL AND to_type <> from_type GROUP BY 1, 2
), j AS (
  SELECT a.n, b.n AS n_rev FROM tr a LEFT JOIN tr b
    ON b.from_type = a.to_type AND b.to_type = a.from_type)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN n_rev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_recip_edges,
       CAST(sum(n) AS BIGINT) AS w_total,
       CAST(sum(coalesce(least(n, n_rev), 0)) AS BIGINT) AS w_recip,
       CAST((sum(CASE WHEN n_rev IS NOT NULL THEN 1 ELSE 0 END) * 10000)
            // count(*) AS BIGINT) AS edge_recip_e4,
       CAST((sum(coalesce(least(n, n_rev), 0)) * 10000) // sum(n) AS BIGINT)
         AS w_recip_e4
FROM j""",

    // per-asset symbol-entropy screen: exact histogram counts, one
    // double chain rounded once (the xent_nats convention)
    "m_payload_entropy" -> """WITH px AS (
  SELECT doc_id AS asset_id, length(text) AS n, text
  FROM documents WHERE length(text) >= 1
), b AS (
  SELECT asset_id,
         unnest(list_transform(range(1, n + 1),
           i -> ascii(substr(text, CAST(i AS INT), 1)))) AS b
  FROM px
), h AS (SELECT asset_id, b, count(*) AS c FROM b GROUP BY 1, 2)
SELECT asset_id, CAST(sum(c) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(c)) / sum(c), 4)
         AS entropy_nats
FROM h GROUP BY asset_id""",

    // Kaplan-Meier time-to-first-purchase: exact counts, one double
    // chain (ln -> ordered cumsum -> exp) rounded once at 4
    "a_survival" -> """WITH ev AS (
  SELECT user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
  FROM events
), per AS (
  SELECT user_id, min(day) AS d0,
         min(CASE WHEN event_type = 'purchase' THEN day END) AS dp
  FROM ev GROUP BY 1
), g AS (SELECT max(day) AS dmax FROM ev),
byt AS (
  SELECT CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dmax - d0 END AS t,
         count(*) AS n_at_t,
         sum(CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END) AS d_events
  FROM per CROSS JOIN g GROUP BY 1
), r AS (
  SELECT t, n_at_t, d_events,
         CAST(sum(n_at_t) OVER (ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
           AS n_risk
  FROM byt
), s AS (
  SELECT t, n_risk, d_events, n_at_t,
         sum(CASE WHEN d_events < n_risk
                  THEN ln(CAST(n_risk - d_events AS DOUBLE) / n_risk)
                  ELSE 0.0 END)
           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnsum,
         sum(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS anydead
  FROM r)
SELECT t, n_risk, CAST(d_events AS BIGINT) AS d_events,
       CAST(n_at_t - d_events AS BIGINT) AS c_censored,
       CASE WHEN anydead > 0 THEN 0.0 ELSE round(exp(lnsum), 4) END AS s_km
FROM s""",

    // Lorenz deciles on the a_gini quantized histogram: poorest-m
    // prefix takes a proportional slice of its bucket's mass
    "a_lorenz" -> """WITH rev AS (
  SELECT o.o_custkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
           (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS x
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
), mx AS (SELECT max(x) AS mx FROM rev),
bucketed AS (
  SELECT x * 4096 // (mx + 1) AS b, count(*) AS c, CAST(sum(x) AS BIGINT) AS bx
  FROM rev CROSS JOIN mx GROUP BY 1
), cum AS (
  SELECT b, c, bx,
         CAST(coalesce(sum(c) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS BIGINT)
           AS start,
         CAST(coalesce(sum(bx) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before,
         CAST(sum(c) OVER () AS BIGINT) AS n,
         CAST(sum(bx) OVER () AS BIGINT) AS t
  FROM bucketed)
SELECT k, CAST((k * n) // 10 AS BIGINT) AS n_members,
       round((CAST(cum_before AS DOUBLE) * c + CAST(bx AS DOUBLE)
         * ((k * n) // 10 - start + 1)) / c / t, 6) AS cum_share
FROM (SELECT unnest(range(1, 11)) AS k) d
JOIN cum ON (k * n) // 10 >= start AND (k * n) // 10 < start + c""",

    // densified Lorenz twin: LEFT probe + mirrored coalesce keeps the
    // degenerate (member-count-zero) deciles as explicit rows
    "a_lorenz_dense" -> """WITH rev AS (
  SELECT o.o_custkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
           (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS x
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
), mx AS (SELECT max(x) AS mx FROM rev),
bucketed AS (
  SELECT x * 4096 // (mx + 1) AS b, count(*) AS c, CAST(sum(x) AS BIGINT) AS bx
  FROM rev CROSS JOIN mx GROUP BY 1
), cum AS (
  SELECT b, c, bx,
         CAST(coalesce(sum(c) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS BIGINT)
           AS start,
         CAST(coalesce(sum(bx) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before,
         CAST(sum(c) OVER () AS BIGINT) AS n,
         CAST(sum(bx) OVER () AS BIGINT) AS t
  FROM bucketed)
SELECT k, CAST(coalesce((k * n) // 10, 0) AS BIGINT) AS n_members,
       coalesce(round((CAST(cum_before AS DOUBLE) * c + CAST(bx AS DOUBLE)
         * ((k * n) // 10 - start + 1)) / c / t, 6), 0.0) AS cum_share
FROM (SELECT unnest(range(1, 11)) AS k) d
LEFT JOIN cum ON (k * n) // 10 >= start AND (k * n) // 10 < start + c""",

    // code-vs-prose router: symbol density + keyword hit rate, both
    // exact integer thresholds; keyword set is a shared literal
    "t_code_detect" -> s"""$TOKS, c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[{}()\\[\\];=<>]')) AS BIGINT)
           AS n_sym,
         CAST(len(list_filter(tk, t -> t IN ('def','class','return',
           'import','function','var','const','int','void','public','if',
           'else','for','while'))) AS BIGINT) AS n_kw,
         CAST(len(tk) AS BIGINT) AS n_words,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM toks WHERE len(tk) >= 1)
SELECT doc_id, n_sym, n_kw,
       CAST((n_sym * 10000) // n_chars AS BIGINT) AS sym_e4,
       CAST((n_kw * 10000) // n_words AS BIGINT) AS kw_e4,
       (n_sym * 10000) // n_chars >= 300
         OR (n_kw * 10000) // n_words >= 500 AS is_code
FROM c""",

    // dedup-threshold calibration sweep over the shared pair frame:
    // e4-requantized jaccard against five literal dials
    "d_threshold_sweep" -> s"""$LSH_PAIRS, pe AS (
  SELECT doc_a, doc_b, CAST(round(jaccard * 10000) AS BIGINT) AS j_e4
  FROM pairs
), swept AS (
  SELECT doc_a, doc_b, j_e4, t.threshold_e4
  FROM pe, (SELECT unnest([5000, 6000, 7000, 8000, 9000]) AS threshold_e4) t
  WHERE j_e4 >= t.threshold_e4
), np AS (
  SELECT threshold_e4, count(*) AS n_pairs FROM swept GROUP BY 1
), nd AS (
  SELECT threshold_e4, count(DISTINCT doc_id) AS n_docs FROM (
    SELECT threshold_e4, doc_a AS doc_id FROM swept
    UNION ALL SELECT threshold_e4, doc_b FROM swept)
  GROUP BY 1
)
SELECT np.threshold_e4, CAST(np.n_pairs AS BIGINT) AS n_pairs,
       CAST(nd.n_docs AS BIGINT) AS n_docs
FROM np JOIN nd ON nd.threshold_e4 = np.threshold_e4""",

    // embedding-norm hygiene: squared norms as exact longs (e3
    // quantized before squaring, the GramMatrixFixed convention)
    "s_norm_audit" -> """WITH n AS (
  SELECT label,
         list_aggregate(list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
              * CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
           'sum') AS n2
  FROM embeddings)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(min(n2) AS BIGINT) AS min_n2_fx,
       CAST(max(n2) AS BIGINT) AS max_n2_fx,
       CAST(sum(n2) // count(*) AS BIGINT) AS mean_n2_fx
FROM n GROUP BY label""",

    // difference-in-differences: parity treatment, calendar-midpoint
    // cut, exact e4 cell sums, one mirrored double chain
    "a_did" -> """WITH ev AS (
  SELECT user_id % 2 = 0 AS treated,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
         CAST(round(value * 10000) AS BIGINT) AS v_fx
  FROM events
), c AS (SELECT (min(day) + max(day) + 1) // 2 AS cut FROM ev),
cells AS (
  SELECT treated, day >= cut AS post, count(*) AS n,
         CAST(sum(v_fx) AS BIGINT) AS s_fx
  FROM ev CROSS JOIN c GROUP BY 1, 2)
SELECT CAST(sum(CASE WHEN treated AND post THEN n END) AS BIGINT) AS n_tp,
       CAST(sum(CASE WHEN treated AND post THEN s_fx END) AS BIGINT) AS s_tp,
       CAST(sum(CASE WHEN treated AND NOT post THEN n END) AS BIGINT) AS n_t0,
       CAST(sum(CASE WHEN treated AND NOT post THEN s_fx END) AS BIGINT) AS s_t0,
       CAST(sum(CASE WHEN NOT treated AND post THEN n END) AS BIGINT) AS n_cp,
       CAST(sum(CASE WHEN NOT treated AND post THEN s_fx END) AS BIGINT) AS s_cp,
       CAST(sum(CASE WHEN NOT treated AND NOT post THEN n END) AS BIGINT) AS n_c0,
       CAST(sum(CASE WHEN NOT treated AND NOT post THEN s_fx END) AS BIGINT) AS s_c0,
       round((CAST(sum(CASE WHEN treated AND post THEN s_fx END) AS DOUBLE)
                / sum(CASE WHEN treated AND post THEN n END)
              - CAST(sum(CASE WHEN treated AND NOT post THEN s_fx END) AS DOUBLE)
                / sum(CASE WHEN treated AND NOT post THEN n END)
              - (CAST(sum(CASE WHEN NOT treated AND post THEN s_fx END) AS DOUBLE)
                   / sum(CASE WHEN NOT treated AND post THEN n END)
                 - CAST(sum(CASE WHEN NOT treated AND NOT post THEN s_fx END) AS DOUBLE)
                   / sum(CASE WHEN NOT treated AND NOT post THEN n END)))
             / 10000.0, 6) AS did_effect
FROM cells""",

    // winsorized revenue mean on the a_gini quantized histogram:
    // clamp below-p5 / above-p95 members to their threshold buckets'
    // means; exact longs into one mirrored double chain
    "a_winsorized" -> """WITH rev AS (
  SELECT o.o_custkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
           (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS x
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
), mx AS (SELECT max(x) AS mx FROM rev),
cum AS (
  SELECT b, c, bx,
         CAST(coalesce(sum(c) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS BIGINT)
           AS start,
         CAST(sum(c) OVER () AS BIGINT) AS n
  FROM (
    SELECT x * 4096 // (mx + 1) AS b, count(*) AS c,
           CAST(sum(x) AS BIGINT) AS bx
    FROM rev CROSS JOIN mx GROUP BY 1)
), lob AS (
  SELECT b AS b_lo, c AS c_lo, bx AS bx_lo FROM cum
  WHERE start <= greatest((5 * n) // 100, 1)
    AND greatest((5 * n) // 100, 1) < start + c
), hib AS (
  SELECT b AS b_hi, c AS c_hi, bx AS bx_hi FROM cum
  WHERE start <= greatest((95 * n) // 100, 1)
    AND greatest((95 * n) // 100, 1) < start + c
)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(max(b_lo) AS BIGINT) AS b_lo, CAST(max(b_hi) AS BIGINT) AS b_hi,
       CAST(sum(CASE WHEN b < b_lo THEN c ELSE 0 END) AS BIGINT) AS n_below,
       CAST(sum(CASE WHEN b > b_hi THEN c ELSE 0 END) AS BIGINT) AS n_above,
       round(CAST(sum(bx) AS DOUBLE) / max(n), 4) AS mean_fx,
       round((sum(CASE WHEN b < b_lo THEN c ELSE 0 END)
                * (CAST(max(bx_lo) AS DOUBLE) / max(c_lo))
              + sum(CASE WHEN b >= b_lo AND b <= b_hi THEN bx ELSE 0 END)
              + sum(CASE WHEN b > b_hi THEN c ELSE 0 END)
                * (CAST(max(bx_hi) AS DOUBLE) / max(c_hi))) / max(n), 4)
         AS winsor_mean_fx
FROM cum CROSS JOIN lob CROSS JOIN hib""",

    // capped perceptual banding: the m_ahash_dedup fingerprints banded
    // into 7 pigeonhole segments, buckets over the 32-cap dropped
    // BEFORE the self-join — the oracle replays the capped contract
    "m_ahash_capped" -> {
      val bounds = (0 to 7).map(i => i * 60 / 7)
      val segs = (0 until 7).map { i =>
        val lo = bounds(i); val w = bounds(i + 1) - lo
        s"SELECT doc_id, h, $i AS seg, (h >> $lo) & ${(1L << w) - 1} AS segval FROM fp"
      }.mkString("\n  UNION ALL ")
      s"""WITH px AS (
  SELECT doc_id,
         list_transform(range(0, 60), i ->
           CAST(ascii(substr(text,
             CAST(1 + (i * length(text)) // 60 AS INT), 1)) AS BIGINT)) AS p
  FROM documents WHERE length(text) >= 1
), ps AS (
  SELECT doc_id, p, list_aggregate(p, 'sum') AS sp FROM px
), fp AS (
  SELECT doc_id, CAST(list_aggregate(list_transform(range(0, 60), i ->
    CASE WHEN p[CAST(i + 1 AS INT)] * 60 > sp
         THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
         ELSE CAST(0 AS BIGINT) END), 'sum') AS BIGINT) AS h
  FROM ps
), banded AS (
  $segs
), kept AS (
  SELECT banded.* FROM banded
  JOIN (SELECT seg, segval FROM banded GROUP BY 1, 2 HAVING count(*) <= 32) k
    USING (seg, segval)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
FROM kept a JOIN kept b
  ON a.seg = b.seg AND a.segval = b.segval AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= 6"""
    },
  )

  /** Shared CTE chain of the mass-conserving Markov power iteration
    * (matrix build + eight unrolled conserving steps, ending at the
    * v8 CTE) — consumed by a_markov_conserve (final SELECT) and
    * a_markov_entropy (further CTEs). A def, not a val: it is
    * referenced from the map initializer above. */
  private def MARKOV_V8: String = """WITH tr AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT event_type AS from_type,
           lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS to_type
    FROM events)
  WHERE to_type IS NOT NULL GROUP BY 1, 2
), p AS (
  SELECT from_type, to_type,
         n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS p_e6
  FROM tr
), st AS (
  SELECT t, min(t) OVER () AS t0, CAST(count(*) OVER () AS BIGINT) AS ns
  FROM (SELECT from_type AS t FROM p UNION SELECT to_type FROM p)
), v0 AS (SELECT t, CAST(1000000 AS BIGINT) AS v FROM st)""" +
    (1 to 8).map(i => s""",
r$i AS (
  SELECT s.t, s.t0, s.ns, coalesce(x.vr, 0) AS vr,
         CAST(sum(coalesce(x.vr, 0)) OVER () AS BIGINT) AS tot1
  FROM st s LEFT JOIN (
    SELECT p.to_type AS t, CAST(sum(v * p_e6 // 1000000) AS BIGINT) AS vr
    FROM v${i - 1} JOIN p ON v${i - 1}.t = p.from_type GROUP BY 1) x
  ON s.t = x.t),
v$i AS (
  SELECT t, CAST(vr + (ns * 1000000 - tot1) // ns
           + CASE WHEN t = t0 THEN (ns * 1000000 - tot1) % ns ELSE 0 END
           AS BIGINT) AS v
  FROM r$i)""").mkString
}
