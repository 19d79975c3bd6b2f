"""DuckDB oracle SQL for every SQL-expressible query in queries.py.

Column names and numeric contracts (integer sums, exact int/int divisions,
money in cents) match the Ray implementations exactly — the driver compares
value hashes after sorting columns by name.

IMPORTANT dtype contract: DuckDB returns ``sum(BIGINT)`` as HUGEINT, which
``fetchdf()`` renders as float64 while the Ray side emits int64, so the
driver's typed value-hash fails even when values are equal.  Every ``sum``
here is therefore wrapped in ``CAST(... AS BIGINT)``.  ``count(*)`` is
already BIGINT and needs no cast.

NULL-text contract: the engine treats a NULL text as the empty string
everywhere (repo-wide invariant), so every text expression here reads
``coalesce(text, '')`` — a bare ``regexp_extract_all(text, ...)`` would
yield NULL token lists and silently diverge on real crawl parquet (which
routinely carries null text). Pinned by the null-corpus DuckDB compare in
tests/test_edge_cases.py.
"""

ORACLES: dict[str, str] = {
    "quality_stats": """
        WITH feats AS (
            SELECT source,
                   n_chars,
                   len(regexp_extract_all(coalesce(text, ''), '[^\\s]+')) AS n_words,
                   len(list_distinct(regexp_extract_all(coalesce(text, ''), '[^\\s]+')))
                       AS n_distinct
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_words) AS BIGINT) AS total_words,
               CAST(sum(n_distinct) AS BIGINT) AS total_distinct_words,
               CAST(sum(CASE WHEN n_chars BETWEEN 150 AND 450
                              AND n_words >= 20
                              AND n_distinct::DOUBLE / n_words >= 0.2
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM feats
        GROUP BY source
    """,
    "dedup_exact": """
        SELECT min(doc_id) AS doc_id
        FROM documents
        GROUP BY coalesce(text, '')
    """,
    "fingerprints": """
        SELECT doc_id,
               md5(regexp_replace(trim(coalesce(text, ''), ' '), '\\s+', ' ', 'g')) AS fingerprint
        FROM documents
    """,
    # Score is tf ÷ df computed as one IEEE double division of two exact
    # integers on both engines — bit-identical, unlike a transcendental idf.
    "tfidf_top_terms": """
        WITH tfc AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(coalesce(text, ''), '[^\\s]+')) AS term
                FROM documents
            )
            GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, count(*) AS df FROM tfc GROUP BY term
        ),
        ranked AS (
            SELECT t.doc_id, t.term,
                   CAST(t.tf AS DOUBLE) / d.df AS score,
                   row_number() OVER (
                       PARTITION BY t.doc_id
                       ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC, t.term
                   ) AS rnk
            FROM tfc t JOIN df d USING (term)
        )
        SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rank
        FROM ranked
        WHERE rnk <= 3
    """,
    "gopher_repetition": """
        WITH toks AS (
            SELECT doc_id, length(coalesce(text, '')) AS n_chars,
                   regexp_extract_all(coalesce(text, ''), '[^\\s]+') AS tk
            FROM documents
        ),
        g2 AS (
            SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS gram
            FROM toks,
                 LATERAL (SELECT unnest(range(1, greatest(len(tk), 1))) AS i)
        ),
        top2 AS (
            SELECT doc_id, max(cnt * length(gram)) AS top2gram_chars
            FROM (SELECT doc_id, gram, count(*) AS cnt
                  FROM g2 GROUP BY doc_id, gram)
            GROUP BY doc_id
        ),
        g3 AS (
            SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS gram
            FROM toks,
                 LATERAL (SELECT unnest(range(1, greatest(len(tk) - 1, 1))) AS i)
        ),
        dup3 AS (
            SELECT doc_id, count(*) - count(DISTINCT gram) AS dup3gram_count
            FROM g3 GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(len(t.tk) AS BIGINT) AS n_tokens,
               CAST(coalesce(top2.top2gram_chars, 0) AS BIGINT) AS top2gram_chars,
               CAST(coalesce(dup3.dup3gram_count, 0) AS BIGINT) AS dup3gram_count,
               CAST(CASE WHEN 5 * coalesce(top2.top2gram_chars, 0) <= t.n_chars
                          AND 10 * coalesce(dup3.dup3gram_count, 0)
                              <= greatest(len(t.tk) - 2, 0)
                    THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
        FROM toks t
        LEFT JOIN top2 USING (doc_id)
        LEFT JOIN dup3 USING (doc_id)
    """,
    "crossdoc_ngrams": """
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(coalesce(text, ''), '[^\\s]+') AS tk
            FROM documents
        ),
        g5 AS (
            SELECT DISTINCT doc_id, array_to_string(tk[i:i+4], ' ') AS gram
            FROM toks,
                 LATERAL (SELECT unnest(range(1, greatest(len(tk) - 3, 1))) AS i)
        )
        SELECT gram, CAST(count(*) AS BIGINT) AS n_docs
        FROM g5
        GROUP BY gram
        HAVING count(*) >= 2
        ORDER BY n_docs DESC, gram
        LIMIT 50
    """,
    "vocab_top_tokens": """
        WITH toks AS (
            SELECT unnest(regexp_extract_all(coalesce(text, ''), '[^\\s]+')) AS token
            FROM documents
        )
        SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM toks
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 100
    """,
    "token_counts": """
        WITH toks AS (
            SELECT source,
                   len(regexp_extract_all(coalesce(text, ''), '[^\\s]+')) AS n_tokens,
                   len(regexp_extract_all(
                       coalesce(text, ''),
                       ' ?[A-Za-z가-힣]+| ?[0-9]+| ?[^ \\t\\n\\r\\x0b\\x0cA-Za-z가-힣0-9]+'
                   )) AS bpe
            FROM documents
        )
        SELECT source,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               max(n_tokens) AS max_tokens,
               CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
               count(*) AS n_docs
        FROM toks
        GROUP BY source
    """,
    "doc_samples": """
        SELECT 'stratified' AS method, lang, doc_id
        FROM documents
        WHERE substr(md5(regexp_replace(trim(coalesce(text, ''), ' '),
                                        '\\s+', ' ', 'g')), 1, 4)
              < CASE WHEN lang = 'ko' THEN '4000' ELSE '1000' END
        UNION ALL
        SELECT 'per_lang_k' AS method, lang, doc_id
        FROM (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(regexp_replace(trim(coalesce(text, ''), ' '),
                                                   '\\s+', ' ', 'g')),
                                doc_id
                   ) AS rank
            FROM documents
        )
        WHERE rank <= 3
    """,
    # EXISTS, not IN: `x IN (set containing NULL)` is NULL for non-members
    # under SQL three-valued logic, which would mint a third `matched`
    # group on null-bearing customer keys; EXISTS is two-valued and
    # matches the engine's semi/anti split exactly.
    "orders_exists_split": """
        SELECT o_orderstatus,
               EXISTS (SELECT 1 FROM customer c
                       WHERE c.c_custkey = orders.o_custkey
                         AND c.c_acctbal > 5000) AS matched,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS price_cents,
               count(*) AS n_orders
        FROM orders
        GROUP BY 1, 2
    """,
    # Tumbling ∪ hopping in one table; time_bucket's 2000-01-01 origin is
    # 30-min-aligned with the epoch grid the engine floors to.
    "events_windows": """
        WITH e AS (
            SELECT event_type,
                   ts,
                   time_bucket(INTERVAL 30 MINUTE, ts) AS b,
                   CAST(round(value * 1000000, 0) AS BIGINT) AS vm
            FROM events
        ),
        hop AS (
            SELECT event_type, b AS window_start, vm FROM e
            UNION ALL
            SELECT event_type, b - INTERVAL 30 MINUTE, vm FROM e
        )
        SELECT 'tumbling' AS window_kind, event_type,
               date_trunc('hour', ts) AS window_start,
               count(*) AS n_events,
               CAST(sum(vm) AS BIGINT) AS total_value_micros
        FROM e
        GROUP BY event_type, date_trunc('hour', ts)
        UNION ALL
        SELECT 'hopping' AS window_kind, event_type, window_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(vm) AS BIGINT) AS total_value_micros
        FROM hop
        GROUP BY event_type, window_start
    """,
    # Both decontamination variants (exact 24-char phrase; token-8-gram
    # overlap on n-gram STRINGS — hash-free, see q_decontaminate).
    "decontaminate": """
        WITH bench AS (
            SELECT doc_id, coalesce(text, '') AS text
            FROM documents
            WHERE md5(regexp_replace(trim(coalesce(text, ''), ' '),
                                     '\\s+', ' ', 'g')) LIKE '0%'
        ),
        corpus AS (
            SELECT doc_id, coalesce(text, '') AS text
            FROM documents
            WHERE md5(regexp_replace(trim(coalesce(text, ''), ' '),
                                     '\\s+', ' ', 'g')) NOT LIKE '0%'
        ),
        phrases AS (
            SELECT DISTINCT substr(trim(text, ' '), 1, 24) AS phrase
            FROM bench
            WHERE length(trim(text, ' ')) >= 24
        ),
        sub AS (
            SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n
            FROM corpus c JOIN phrases b ON contains(c.text, b.phrase)
            GROUP BY c.doc_id
        ),
        bench_tk AS (
            SELECT regexp_extract_all(text, '[^\\s]+') AS tk FROM bench
        ),
        corpus_tk AS (
            SELECT doc_id, regexp_extract_all(text, '[^\\s]+') AS tk
            FROM corpus
        ),
        bench_g AS (
            SELECT DISTINCT array_to_string(tk[i:i+7], ' ') AS gram
            FROM bench_tk,
                 LATERAL (SELECT unnest(range(1, greatest(len(tk) - 6, 1))) AS i)
        ),
        corpus_g AS (
            SELECT doc_id, array_to_string(tk[i:i+7], ' ') AS gram
            FROM corpus_tk,
                 LATERAL (SELECT unnest(range(1, greatest(len(tk) - 6, 1))) AS i)
        ),
        ngr AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n
            FROM corpus_g JOIN bench_g USING (gram)
            GROUP BY doc_id
        )
        SELECT 'substring' AS method, doc_id, n FROM sub
        UNION ALL
        SELECT 'ngram8' AS method, doc_id, n FROM ngr
    """,
    "dedup_page_lines": """
        SELECT doc_id,
               array_to_string(
                   list_filter(lines,
                       (l, i) -> trim(l, ' ' || chr(9) || chr(13) || chr(11)
                                         || chr(12)) = ''
                                 OR list_position(lines, l) = i),
                   chr(10)) AS clean_text,
               CAST(len(lines) - len(list_filter(lines,
                       (l, i) -> trim(l, ' ' || chr(9) || chr(13) || chr(11)
                                         || chr(12)) = ''
                                 OR list_position(lines, l) = i))
                    AS BIGINT) AS n_removed
        FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS lines
              FROM documents)
    """,
    # Exact all-pairs 3-gram Jaccard, mirroring the engine's inverted-index
    # semantics exactly: distinct space-joined token 3-grams per doc, |A|
    # counts ALL of a doc's grams, candidate pairs only through grams with
    # df ≤ 50 (the stop-gram cap applied identically on both sides),
    # jaccard = shared / (|A|+|B|-shared) as one exact int/int division.
    "jaccard_pairs_exact": """
        WITH tk AS (
            SELECT doc_id, regexp_extract_all(coalesce(text, ''), '[^\\s]+') AS t
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS gram
            FROM tk,
                 LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 1))) AS i)
        ),
        sizes AS (
            SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
        ),
        keep AS (
            SELECT doc_id, gram FROM grams
            QUALIFY count(*) OVER (PARTITION BY gram) <= 50
        ),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS shared
            FROM keep a JOIN keep b
              ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT s.id_a, s.id_b, s.shared,
               CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) AS jaccard
        FROM shared s
        JOIN sizes sa ON sa.doc_id = s.id_a
        JOIN sizes sb ON sb.doc_id = s.id_b
        WHERE CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) >= 0.5
    """,
    # Greedy first-fit sequence packing replayed as a per-bucket recursive
    # CTE (one recursion step per doc in bucket rank order, exactly the
    # engine's in-bucket scan); docs longer than the budget are their own
    # oversize sequences outside the scan. Compared as the multiset of
    # (bucket, n_docs, n_tokens, oversize) rows — see q_pack_sequences.
    "pack_sequences": """
        WITH RECURSIVE d AS (
            SELECT doc_id,
                   CAST(doc_id % 8 AS INTEGER) AS bucket,
                   len(regexp_extract_all(
                       coalesce(text, ''),
                       ' ?[A-Za-z가-힣]+| ?[0-9]+| ?[^ \\t\\n\\r\\x0b\\x0cA-Za-z가-힣0-9]+'
                   )) AS t
            FROM documents
        ),
        packable AS (
            SELECT bucket, t,
                   row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
            FROM d WHERE t <= 90
        ),
        rec AS (
            SELECT bucket, rn, t, t AS cum, 0 AS seq
            FROM packable WHERE rn = 1
            UNION ALL
            SELECT p.bucket, p.rn, p.t,
                   CASE WHEN rec.cum + p.t > 90 THEN p.t
                        ELSE rec.cum + p.t END,
                   CASE WHEN rec.cum + p.t > 90 THEN rec.seq + 1
                        ELSE rec.seq END
            FROM rec JOIN packable p
              ON p.bucket = rec.bucket AND p.rn = rec.rn + 1
        )
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(t) AS BIGINT) AS n_tokens, false AS oversize
        FROM rec GROUP BY bucket, seq
        UNION ALL
        SELECT CAST(doc_id % 8 AS INTEGER), CAST(1 AS BIGINT),
               CAST(t AS BIGINT), true
        FROM d WHERE t > 90
    """,
    # Brute-force all-pairs word-3-gram Jaccard — the no-LSH ground truth
    # the engine's LSH-candidate + exact-verify plan must reproduce
    # exactly (recall-1 operating point; see q_ngram_jaccard_pairs).
    # Word tokens mirror functions/hashing._WORD_RE verbatim — the
    # multi-script class extracted from RAW text, each token lowercased
    # AFTER extraction (the engine's extract-then-lower contract: scripts
    # whose lower() diverges cross-engine are outside the class, so
    # full-text lower() can't leak a divergent mapping into a token). A
    # doc with fewer than 3 tokens contributes its whole token string as
    # its one gram (word_ngrams' short-doc rule).
    "ngram_jaccard_pairs": """
        WITH tok AS (
            SELECT doc_id,
                   list_transform(
                       regexp_extract_all(
                           coalesce(text, ''),
                           '[A-Za-z0-9_À-ÖØ-öø-ÿЀ-ӿ֐-׿؀-ۿऀ-ॿ฀-๿぀-ヿ㐀-䶿一-鿿가-힣]+'),
                       t -> lower(t)) AS tk
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS gram
            FROM tok,
                 LATERAL (SELECT unnest(range(1, greatest(len(tk) - 1, 1))) AS i)
            WHERE len(tk) >= 3
            UNION
            SELECT doc_id, array_to_string(tk, ' ')
            FROM tok WHERE len(tk) BETWEEN 1 AND 2
        ),
        sizes AS (
            SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
        ),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM grams a JOIN grams b
              ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT s.id_a, s.id_b,
               CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) AS jaccard
        FROM shared s
        JOIN sizes sa ON sa.doc_id = s.id_a
        JOIN sizes sb ON sb.doc_id = s.id_b
        WHERE CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) >= 0.5
    """,
    # Connected components over the exact-Jaccard pair set as a recursive
    # transitive closure (the engine's min-label propagation reaches the
    # same fixed point): reach(node, r) holds every (node, id that reaches
    # it); min(r) per node = the component's smallest doc_id.
    "dup_clusters": """
        WITH RECURSIVE tk AS (
            SELECT doc_id, regexp_extract_all(coalesce(text, ''), '[^\\s]+') AS t
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS gram
            FROM tk,
                 LATERAL (SELECT unnest(range(1, greatest(len(t) - 1, 1))) AS i)
        ),
        sizes AS (
            SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
        ),
        keep AS (
            SELECT doc_id, gram FROM grams
            QUALIFY count(*) OVER (PARTITION BY gram) <= 50
        ),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM keep a JOIN keep b
              ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT s.id_a, s.id_b
            FROM shared s
            JOIN sizes sa ON sa.doc_id = s.id_a
            JOIN sizes sb ON sb.doc_id = s.id_b
            WHERE CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared) >= 0.5
        ),
        und AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        reach(node, r) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM und)
            UNION
            SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.node
        )
        SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach
        GROUP BY node
    """,
    # SimHash pairing machinery vs the O(n²) hamming self-join it avoids.
    # Signatures are the same deterministic md5-derived plant the engine
    # computes (see q_simhash_pairs); pigeonhole recall is exactly 1, so
    # the chunk-bucketed engine plan must reproduce this brute force
    # EXACTLY — pairs, hamming values and all.
    "simhash_pairs": """
        WITH s AS (
            SELECT doc_id,
                   xor(CAST(concat('0x', substr(md5(CAST(abs(doc_id) // 10
                                                         AS VARCHAR)), 1, 16))
                            AS UBIGINT),
                       CAST(1 AS UBIGINT)
                           << CAST(abs(doc_id) % 10 AS INTEGER)) AS sig
            FROM documents
            WHERE doc_id IS NOT NULL
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """,
    "top_longest": """
        SELECT doc_id, n_chars
        FROM documents
        WHERE n_chars IS NOT NULL
        ORDER BY n_chars DESC, doc_id
        LIMIT 20
    """,
    "lineitem_rollup": """
        SELECT l_returnflag,
               l_linestatus,
               CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_pct,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "lang_source_pivot": """
        WITH d AS (
            SELECT lang, source FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
        ),
        p AS (PIVOT d ON source USING count(*) GROUP BY lang),
        s AS (
            SELECT lang,
                   string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources
            FROM d
            GROUP BY lang
        )
        SELECT p.*, s.sources, s.n_sources FROM p JOIN s USING (lang)
    """,
    "orders_monthly_dense": """
        WITH m AS (
            SELECT CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1)
                        AS BIGINT) AS month_idx,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders
        ),
        agg AS (
            SELECT month_idx,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(cents) AS BIGINT) AS total_cents
            FROM m GROUP BY month_idx
        ),
        months AS (
            SELECT unnest(range((SELECT min(month_idx) FROM m),
                                (SELECT max(month_idx) FROM m) + 1))
                   AS month_idx
        )
        SELECT CAST(months.month_idx // 12 AS VARCHAR) || '-'
                 || lpad(CAST(months.month_idx % 12 + 1 AS VARCHAR), 2, '0')
               AS ym,
               coalesce(agg.n_orders, 0) AS n_orders,
               coalesce(agg.total_cents, 0) AS total_cents
        FROM months LEFT JOIN agg USING (month_idx)
    """,
    # The oracle is the O(n²) fuzzy self-join the engine's deletion-
    # neighborhood blocking avoids; levenshtein returns INT32 → cast.
    "fuzzy_supplier_pairs": """
        SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
               CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS lev
        FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
    # coalesce: a frame whose values are all NULL sums to NULL in SQL; the
    # engine's integer contract renders that running total as 0.
    "running_user_totals": """
        SELECT event_id, user_id,
               CAST(coalesce(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 0) AS BIGINT) AS cum_cents
        FROM events
    """,
    # Double TRY_CAST mirrors the engine's only-integer-k contract:
    # malformed JSON (json_extract would THROW on it), non-object values
    # and non-integer k are all absent on both sides, never an error.
    "json_props_rollup": """
        WITH j AS (
            SELECT event_type,
                   json_extract(TRY_CAST(props AS JSON), '$.k') AS jk
            FROM events
        ),
        e AS (
            -- json_type gates the integer-only contract: TRY_CAST(JSON AS
            -- BIGINT) would round DOUBLEs and convert BOOLEANs.
            SELECT event_type,
                   CASE WHEN json_type(jk) IN ('UBIGINT', 'BIGINT')
                        THEN TRY_CAST(jk AS BIGINT) END AS k
            FROM j
        )
        SELECT event_type,
               CAST(sum(coalesce(k, 0)) AS BIGINT) AS sum_k,
               CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_with_k,
               CAST(count(*) AS BIGINT) AS n_events
        FROM e
        GROUP BY event_type
    """,
    "adaptive_quality_gate": """
        WITH med AS (
            SELECT lang,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS m
            FROM documents GROUP BY lang
        )
        SELECT d.lang,
               CAST(sum(CASE WHEN d.n_chars >= med.m THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(count(d.n_chars) AS BIGINT) AS n_docs
        FROM documents d JOIN med ON med.lang = d.lang
        GROUP BY d.lang
    """,
    "exact_distinct_users": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY event_type
    """,
    # Exact distributed variance from integer moments. The HUGEINT casts
    # mirror the engine's Python-bigint finals (n·Σx² − (Σx)² overflows
    # int64); the single HUGEINT→DOUBLE rounding is the shared contract
    # that makes the float columns hash-comparable.
    "events_value_stats": """
        WITH m AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT)
                            * CAST(round(value * 100, 0) AS BIGINT))
                        AS BIGINT) AS sumsq_cents
            FROM events
            GROUP BY event_type
        )
        SELECT event_type, n_events, sum_cents, sumsq_cents,
               CAST(sum_cents AS DOUBLE) / n_events AS mean_cents,
               CAST(CAST(n_events AS HUGEINT) * sumsq_cents
                    - CAST(sum_cents AS HUGEINT) * sum_cents AS DOUBLE)
                 / (CAST(n_events AS DOUBLE) * n_events) AS var_pop_cents2
        FROM m
    """,
    "grouping_rollup": """
        SELECT lang, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY ROLLUP (lang, source)
    """,
    "exact_quantiles": """
        SELECT lang,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
                    AS BIGINT) AS median_chars,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)
                    AS BIGINT) AS p90_chars,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars)
                   AS median_cont,
               percentile_cont(0.75) WITHIN GROUP (ORDER BY n_chars)
                   AS p75_cont,
               CAST(count(n_chars) AS BIGINT) AS n_docs
        FROM documents
        WHERE n_chars IS NOT NULL
        GROUP BY lang
    """,
    "customer_order_counts": """
        SELECT c.c_custkey,
               c.c_mktsegment,
               CAST(count(o.o_custkey) AS BIGINT) AS n_orders,
               CAST(coalesce(
                   sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)), 0
               ) AS BIGINT) AS total_cents
        FROM customer c
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
          ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    """,
    "customers_per_region": """
        SELECT r.r_name,
               count(*) AS n_customers,
               CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS total_bal_cents
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "events_asof_orders": """
        WITH o1 AS (
            SELECT o_custkey, o_orderdate, o_orderpriority
            FROM (
                SELECT o_custkey, o_orderdate, o_orderpriority,
                       row_number() OVER (
                           PARTITION BY o_custkey, o_orderdate
                           ORDER BY o_orderkey DESC
                       ) AS rn
                FROM orders
            )
            WHERE rn = 1
        )
        SELECT o1.o_orderpriority,
               CAST(sum(CAST(round(e.value * 1000000, 0) AS BIGINT)) AS BIGINT)
                   AS total_value_micros,
               count(*) AS n_events
        FROM events e
        ASOF JOIN o1 ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate
        GROUP BY o1.o_orderpriority
    """,
    "value_bands": """
        WITH bands(band, lo, hi) AS (
            VALUES ('b0_10', 0.0, 10.0),
                   ('b10_50', 10.0, 50.0),
                   ('b50_100', 50.0, 100.0),
                   ('b100_1000', 100.0, 1000.0)
        )
        SELECT b.band,
               CAST(sum(CAST(round(e.value * 1000000, 0) AS BIGINT)) AS BIGINT)
                   AS total_value_micros,
               count(*) AS n_events
        FROM events e
        JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band
    """,
    "sessionize": """
        WITH ordered AS (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
            FROM events
        )
        SELECT user_id,
               CAST(sum(CASE WHEN prev_ts IS NULL
                              OR ts - prev_ts > INTERVAL 30 MINUTE
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM ordered
        GROUP BY user_id
    """,
    "top_docs_per_lang": """
        SELECT lang, doc_id, n_chars, rank
        FROM (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n_chars DESC, doc_id
                   ) AS rank
            FROM documents
        )
        WHERE rank <= 3
    """,
    # Null embeddings cannot be scored (engine filters them; see
    # similarity._drop_null_vecs). list_transform strips the child
    # nullability mask a null-bearing parquet column carries — DuckDB's
    # list_cosine_similarity rejects the MASK even when no kept value is
    # null. (Null ELEMENTS inside a vector are out of contract on both
    # engines.)
    # Brute-force all-pairs cosine — the no-LSH ground truth the engine's
    # multi-table hyperplane-LSH + exact-verify plan must reproduce
    # exactly (see q_embedding_dup_pairs: planted near-dups at
    # float64(embedding) + 0.002, ids + 1,000,000, recall 1 at the
    # operating point). list_transform also strips the child nullability
    # mask (same workaround as knn_cosine below).
    "embedding_dup_pairs": """
        WITH base AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
            WHERE embedding IS NOT NULL
        ),
        allv AS (
            SELECT * FROM base
            UNION ALL
            SELECT vec_id + 1000000, list_transform(emb, x -> x + 0.002)
            FROM base WHERE vec_id < 25
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
        FROM allv a JOIN allv b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.emb, b.emb) >= 0.95
    """,
    # Exact top-10 per query, three queries — the ground truth probe-all
    # IVF must reproduce exactly (see q_knn_ivf). Same null-mask
    # workaround as knn_cosine.
    "knn_ivf": """
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> coalesce(x, 0.0))::DOUBLE[]
                       AS emb
            FROM embeddings
            WHERE embedding IS NOT NULL
        ),
        q AS (
            SELECT vec_id AS query_id, emb FROM e WHERE vec_id IN (0, 1, 2)
        )
        SELECT q.query_id, r.vec_id,
               round(list_cosine_similarity(r.emb, q.emb), 6) AS score
        FROM q CROSS JOIN e r
        QUALIFY row_number() OVER (
            PARTITION BY q.query_id
            ORDER BY list_cosine_similarity(r.emb, q.emb) DESC, r.vec_id
        ) <= 10
    """,
    "knn_cosine": """
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> coalesce(x, 0.0))::DOUBLE[]
                       AS emb
            FROM embeddings
            WHERE embedding IS NOT NULL
        ),
        qv AS (SELECT emb FROM e WHERE vec_id = 0)
        SELECT e.vec_id,
               round(list_cosine_similarity(e.emb, qv.emb), 6) AS score
        FROM e CROSS JOIN qv
        ORDER BY list_cosine_similarity(e.emb, qv.emb) DESC, e.vec_id
        LIMIT 10
    """,
}
