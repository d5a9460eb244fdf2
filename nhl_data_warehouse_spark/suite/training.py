"""Training-data pipeline suite: dedup, similarity, text analysis,
multimodal, streaming-twin queries (SURVEY.md §7.2 step 7) — each a
first-class engine capability with a DuckDB oracle wherever SQL can
express the semantics.

Shared determinism conventions (see ``suite/__init__``): hashes are
md5-hex strings (lexicographic order == numeric order), set/count
logic is integer arithmetic, cosines are rounded to 6 dp after
identical double computations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nhl_data_warehouse_spark.operators import dedup, multimodal, similarity, text
from nhl_data_warehouse_spark.suite.registry import load, register

SHINGLE_K = 12
N_HASHES = 8
BAND_SIZE = 2

# DuckDB CTE fragments shared by the minhash-family oracles
_SHINGLES_CTE = f"""
    shingles AS (
        SELECT DISTINCT doc_id, substring(text, i, {SHINGLE_K}) AS shingle
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, greatest(length(text)-{SHINGLE_K - 1}, 1))) AS i
              FROM documents)
        WHERE length(substring(text, i, {SHINGLE_K})) = {SHINGLE_K}
    )
"""

# signature slot i -> (md5-prefix j, 8-hex window start): 4 slots per
# digest, mirroring operators/dedup.py::_mh_window
def _mh_sql(i: int) -> str:
    j, start = (i - 1) // 4, 1 + 8 * ((i - 1) % 4)
    return f"MIN(CASE WHEN j={j} THEN substring(v, {start}, 8) END) AS mh{i}"


def _hex_int_sql(expr: str, n_digits: int) -> str:
    """DuckDB SQL for the integer value of the first ``n_digits`` hex
    chars of ``expr`` (mirrors Spark's ``conv(substring(h,1,n),16,10)``)."""
    terms = [
        f"(instr('0123456789abcdef', substring({expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (n_digits - 1 - i)}"
        for i in range(n_digits)
    ]
    return "(" + " + ".join(terms) + ")"


_N_DIGESTS = (N_HASHES + 3) // 4

_SIG_CTE = f"""
    hashed AS (
        SELECT doc_id, j, MD5(CAST(j AS VARCHAR) || '|' || shingle) AS v
        FROM shingles, (SELECT unnest(generate_series(0, {_N_DIGESTS - 1})) AS j)
    ),
    sig AS (
        SELECT doc_id,
               {", ".join(_mh_sql(i) for i in range(1, N_HASHES + 1))}
        FROM hashed GROUP BY doc_id
    )
"""


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    op_ids="beyond-reference exact dedup (generalizes P7+J3)",
    description="exact duplicate groups by md5 content hash",
    oracle="""
        SELECT MD5(text) AS fingerprint, MIN(doc_id) AS representative_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.exact_dedup(documents)


@register(
    "dedup_exact_normalized",
    op_ids="beyond-reference normalized exact dedup",
    description="dedup on canonicalized text (lower/strip-punct/collapse-ws)",
    oracle=r"""
        SELECT MD5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                       '\s+', ' ', 'g'))) AS fingerprint,
               MIN(doc_id) AS representative_id, COUNT(*) AS n_copies
        FROM documents GROUP BY 1
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.exact_dedup(documents, normalize=True)


@register(
    "dedup_against_history",
    op_ids="beyond-reference incremental-ingest dedup (today's batch "
    "anti-joined against the historical corpus BY CONTENT FINGERPRINT "
    "+ min-id winner within the batch — the nightly-crawl shape; text "
    "never crosses the wire, the history arm reduces to distinct "
    "fingerprints; generalizes J3/M2's key anti-join to content "
    "addressing)",
    description="docs with doc_id%10>=7 treated as the new crawl, the "
    "rest as the stored corpus; survivors are batch docs whose md5 "
    "fingerprint is unseen in history, one winner per fingerprint",
    oracle="""
        WITH hist AS (
            SELECT MD5(text) AS fingerprint FROM documents WHERE doc_id % 10 < 7
        ),
        newb AS (
            SELECT doc_id, MD5(text) AS fingerprint
            FROM documents WHERE doc_id % 10 >= 7
        )
        SELECT MIN(doc_id) AS doc_id, fingerprint
        FROM newb n
        WHERE NOT EXISTS (
            SELECT 1 FROM hist h WHERE h.fingerprint = n.fingerprint
        )
        GROUP BY fingerprint
    """,
)
def dedup_against_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    history = documents.filter(F.col("doc_id") % 10 < 7)
    batch = documents.filter(F.col("doc_id") % 10 >= 7)
    return dedup.dedup_against_corpus(batch, history)


@register(
    "minhash_signatures",
    op_ids="beyond-reference MinHash (shingle -> k-min signature)",
    description=f"{N_HASHES}-hash MinHash signature over char {SHINGLE_K}-gram shingles",
    oracle=f"WITH {_SHINGLES_CTE}, {_SIG_CTE} SELECT * FROM sig",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles_multiset(documents, k=SHINGLE_K)
    return dedup.minhash_signatures(sh, n_hashes=N_HASHES)


@register(
    "minhash_lsh_candidates",
    op_ids="beyond-reference MinHash+LSH banding (bucket-join candidates)",
    description="near-dup candidate pairs agreeing on a full minhash band",
    oracle=f"""
        WITH {_SHINGLES_CTE}, {_SIG_CTE},
        bands AS (
            {" UNION ALL ".join(
                f"SELECT doc_id, {b} AS band, MD5(mh{b * BAND_SIZE + 1} || mh{b * BAND_SIZE + 2}) AS bucket FROM sig"
                for b in range(N_HASHES // BAND_SIZE)
            )}
        )
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles_multiset(documents, k=SHINGLE_K)
    sig = dedup.minhash_signatures(sh, n_hashes=N_HASHES)
    return dedup.minhash_band_candidates(sig, n_hashes=N_HASHES, band_size=BAND_SIZE)


@register(
    "jaccard_near_dups",
    op_ids="beyond-reference n-gram Jaccard near-dup detection",
    description="exact shingle-Jaccard >= 0.5 pairs (freq-capped shared-shingle join)",
    oracle=f"""
        WITH {_SHINGLES_CTE},
        freq_ok AS (SELECT shingle FROM shingles GROUP BY shingle HAVING COUNT(*) <= 50),
        sh AS (SELECT s.* FROM shingles s JOIN freq_ok USING (shingle)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT a_id, b_id,
               n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.5
    """,
)
def jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles(documents, k=SHINGLE_K)
    return dedup.jaccard_pairs(sh, threshold=0.5, max_shingle_freq=50)


@register(
    "lsh_verified_near_dups",
    op_ids="beyond-reference composed dedup pipeline: MinHash -> LSH banding -> exact Jaccard verify",
    description="the production near-dup shape: banded candidates, then exact Jaccard >= 0.5 on candidates only",
    oracle=f"""
        WITH {_SHINGLES_CTE}, {_SIG_CTE},
        bands AS (
            {" UNION ALL ".join(
                f"SELECT doc_id, {b} AS band, MD5(mh{b * BAND_SIZE + 1} || mh{b * BAND_SIZE + 2}) AS bucket FROM sig"
                for b in range(N_HASHES // BAND_SIZE)
            )}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT c.a_id, c.b_id, COUNT(*) AS n_common
            FROM cand c
            JOIN shingles a ON a.doc_id = c.a_id
            JOIN shingles b ON b.doc_id = c.b_id AND b.shingle = a.shingle
            GROUP BY 1, 2
        )
        SELECT a_id, b_id,
               n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.5
    """,
)
def lsh_verified_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles_multiset(documents, k=SHINGLE_K)
    sh = sh.persist()  # feeds signatures AND the verify stage
    sig = dedup.minhash_signatures(sh, n_hashes=N_HASHES)
    cand = dedup.minhash_band_candidates(sig, n_hashes=N_HASHES, band_size=BAND_SIZE)
    return dedup.jaccard_pairs(sh, candidates=cand, threshold=0.5)


@register(
    "prefix_jaccard_near_dups",
    op_ids="beyond-reference EXACT set-similarity join via prefix filtering "
    "(SSJoin/PPJoin candidate generation): rarest-first per-doc shingle "
    "prefix -> prefix-token equi-join -> exact Jaccard verify. Unlike "
    "LSH-then-verify it provably misses nothing; unlike the all-pairs "
    "join it never fans out on frequent shingles — the oracle IS the "
    "uncapped all-pairs answer, proving zero recall loss",
    description="exact shingle-Jaccard >= 0.5 pairs found through "
    "frequency-ordered prefix filtering (no LSH miss risk, no "
    "stop-shingle cap)",
    oracle=f"""
        WITH {_SHINGLES_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
            FROM shingles a
            JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT a_id, b_id,
               n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.5
    """,
)
def prefix_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    # dual-use relation (prefix candidate generation + exact verify):
    # materialize before fan-out so the two consumers provably share
    # one shingle computation (VERDICT r6 item 4; the r6 floor drift
    # itself root-caused to first-execution codegen + ambient noise —
    # see BASELINE.md "prefix_jaccard_near_dups floor drift")
    sh = dedup.char_shingles(documents, k=SHINGLE_K).persist()
    sh.count()
    return dedup.prefix_filter_jaccard_pairs(sh, threshold=0.5)


@register(
    "near_dup_clusters",
    op_ids="beyond-reference duplicate clustering: verified pairs -> connected "
    "components (iterative min-label propagation; oracle is a recursive CTE)",
    description="transitive closure of verified near-dup pairs: cluster id = min "
    "reachable doc id; representatives are what survives dedup",
    oracle=(_NEAR_DUP_CLUSTERS_ORACLE := f"""
        WITH RECURSIVE {_SHINGLES_CTE}, {_SIG_CTE},
        bands AS (
            {" UNION ALL ".join(
                f"SELECT doc_id, {b} AS band, MD5(mh{b * BAND_SIZE + 1} || mh{b * BAND_SIZE + 2}) AS bucket FROM sig"
                for b in range(N_HASHES // BAND_SIZE)
            )}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT c.a_id, c.b_id, COUNT(*) AS n_common
            FROM cand c
            JOIN shingles a ON a.doc_id = c.a_id
            JOIN shingles b ON b.doc_id = c.b_id AND b.shingle = a.shingle
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a_id, b_id FROM inter
            JOIN sizes sa ON sa.doc_id = a_id
            JOIN sizes sb ON sb.doc_id = b_id
            WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.5
        ),
        sym AS (SELECT a_id AS s, b_id AS d FROM pairs
                UNION ALL
                SELECT b_id, a_id FROM pairs),
        reach(node, lab) AS (
            SELECT DISTINCT s, s FROM sym
            UNION
            SELECT sym.s, reach.lab FROM sym JOIN reach ON sym.d = reach.node
        )
        SELECT node AS doc_id, MIN(lab) AS cluster_id,
               (node = MIN(lab)) AS is_representative
        FROM reach GROUP BY node
    """),
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles_multiset(documents, k=SHINGLE_K)
    sh = sh.persist()
    sig = dedup.minhash_signatures(sh, n_hashes=N_HASHES)
    cand = dedup.minhash_band_candidates(sig, n_hashes=N_HASHES, band_size=BAND_SIZE)
    pairs = dedup.jaccard_pairs(sh, candidates=cand, threshold=0.5).select("a_id", "b_id")
    cc = dedup.connected_components(pairs)
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_representative"),
    )


@register(
    "near_dup_clusters_kiveris",
    op_ids="beyond-reference duplicate clustering, deep-graph fallback: "
    "large-star/small-star alternation (Kiveris et al., SoCC'14 — "
    "O(log^2 n) rounds vs min-label's diameter-many)",
    description="identical transitive closure to near_dup_clusters, "
    "computed by the star alternation that survives adversarial deep "
    "dup chains; same recursive-CTE oracle (same fixed point)",
    oracle=_NEAR_DUP_CLUSTERS_ORACLE,
)
def near_dup_clusters_kiveris(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles_multiset(documents, k=SHINGLE_K)
    sh = sh.persist()
    sig = dedup.minhash_signatures(sh, n_hashes=N_HASHES)
    cand = dedup.minhash_band_candidates(sig, n_hashes=N_HASHES, band_size=BAND_SIZE)
    pairs = dedup.jaccard_pairs(sh, candidates=cand, threshold=0.5).select("a_id", "b_id")
    cc = dedup.connected_components_kiveris(pairs)
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_representative"),
    )


@register(
    "near_dup_clusters_starcap",
    op_ids="beyond-reference duplicate clustering under the oversized-"
    "bucket star cap: band buckets above the cap emit only "
    "(representative, member) links — pair count linear in bucket "
    "size, the web-corpus boilerplate/mirror blow-up remedy "
    "(SCALING.md measures the quadratic it prevents)",
    description="near-dup clusters with star_cap=2: 3-member band "
    "buckets contribute 2 star links instead of 3 pairs; the oracle "
    "models the same cap rule, so the capped semantics (not just the "
    "exact-equal case) is what hash-matches",
    oracle=f"""
        WITH RECURSIVE {_SHINGLES_CTE}, {_SIG_CTE},
        bands AS (
            {" UNION ALL ".join(
                f"SELECT doc_id, {b} AS band, MD5(mh{b * BAND_SIZE + 1} || mh{b * BAND_SIZE + 2}) AS bucket FROM sig"
                for b in range(N_HASHES // BAND_SIZE)
            )}
        ),
        sized AS (
            SELECT doc_id, band, bucket,
                   COUNT(*) OVER (PARTITION BY band, bucket) AS bsz,
                   MIN(doc_id) OVER (PARTITION BY band, bucket) AS bmin
            FROM bands
        ),
        cand AS (
            SELECT DISTINCT a_id, b_id FROM (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id
                FROM (SELECT * FROM sized WHERE bsz <= 2) a
                JOIN (SELECT * FROM sized WHERE bsz <= 2) b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
                UNION ALL
                SELECT bmin, doc_id FROM sized
                WHERE bsz > 2 AND doc_id <> bmin
            )
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT c.a_id, c.b_id, COUNT(*) AS n_common
            FROM cand c
            JOIN shingles a ON a.doc_id = c.a_id
            JOIN shingles b ON b.doc_id = c.b_id AND b.shingle = a.shingle
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a_id, b_id FROM inter
            JOIN sizes sa ON sa.doc_id = a_id
            JOIN sizes sb ON sb.doc_id = b_id
            WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.5
        ),
        sym AS (SELECT a_id AS s, b_id AS d FROM pairs
                UNION ALL
                SELECT b_id, a_id FROM pairs),
        reach(node, lab) AS (
            SELECT DISTINCT s, s FROM sym
            UNION
            SELECT sym.s, reach.lab FROM sym JOIN reach ON sym.d = reach.node
        )
        SELECT node AS doc_id, MIN(lab) AS cluster_id,
               (node = MIN(lab)) AS is_representative
        FROM reach GROUP BY node
    """,
)
def near_dup_clusters_starcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles_multiset(documents, k=SHINGLE_K)
    sh = sh.persist()
    sig = dedup.minhash_signatures(sh, n_hashes=N_HASHES)
    cand = dedup.minhash_band_candidates(
        sig, n_hashes=N_HASHES, band_size=BAND_SIZE, star_cap=2
    )
    pairs = dedup.jaccard_pairs(sh, candidates=cand, threshold=0.5).select(
        "a_id", "b_id"
    )
    cc = dedup.connected_components(pairs)
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_representative"),
    )


@register(
    "simhash_sketch",
    op_ids="beyond-reference SimHash sketch",
    description="16-bit simhash per document from token-hash bit votes",
    oracle="""
        WITH tokens AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM documents
        ),
        votes AS (
            SELECT doc_id, b.bit,
                   CASE WHEN strpos('89abcdef', substring(md5(tok), b.bit + 1, 1)) > 0
                        THEN 1 ELSE -1 END AS vote
            FROM tokens, (SELECT unnest(generate_series(0, 15)) AS bit) b
        ),
        sums AS (SELECT doc_id, bit, SUM(vote) AS s FROM votes GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << bit ELSE 0 END)
                    AS BIGINT) AS simhash
        FROM sums GROUP BY doc_id
    """,
)
def simhash_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.simhash(documents, bits=16)


@register(
    "dedup_savings_report",
    op_ids="beyond-reference dedup DECISION scorecard: exact-cluster "
    "size distribution + token savings of keeping one representative "
    "per cluster (mega-clusters vs pair tail distinguishable by "
    "multiplicity) — content collapses to md5 before any shuffle, "
    "two keyed aggregates (hash grain then bounded multiplicity "
    "grain), savings exact integers ((size-1) * shared token count)",
    description="per cluster-size: exact-duplicate clusters, docs, "
    "duplicate docs, and whitespace-tokens saved by keeping one "
    "representative per cluster",
    oracle="""
        WITH per_h AS (
            SELECT md5(text) AS h,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   MIN(len(list_filter(string_split(text, ' '),
                                       t -> t <> ''))) AS tok1
            FROM documents GROUP BY 1
        )
        SELECT n AS cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(n * COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n - 1) AS BIGINT) AS n_dup_docs,
               CAST(SUM((n - 1) * tok1) AS BIGINT) AS tokens_saved
        FROM per_h GROUP BY 1
    """,
)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.dedup_savings_report(documents)


@register(
    "paragraph_dedup_stats",
    op_ids="beyond-reference paragraph-grain exact dedup (the CCNet "
    "paragraph-hash step — the sub-document grain that catches "
    "cross-page boilerplate doc-level MinHash/SimHash never sees): "
    "split on a delimiter, md5 each trimmed paragraph, corpus "
    "frequency over all occurrences, per-doc removal scorecard; "
    "paragraph text never shuffles — occurrences collapse map-side "
    "to (id, md5, length) rows before the hash-grain frequency join",
    description="per document: paragraph count, paragraphs duplicated "
    "anywhere in the corpus, and the character mass a paragraph-grain "
    "boilerplate strip would remove (delimiter ' table ' stands in "
    "for blank-line boundaries on the newline-free testdata corpus)",
    oracle="""
        WITH paras AS (
            SELECT doc_id, trim(p) AS p
            FROM (SELECT doc_id,
                         unnest(string_split(text, ' table ')) AS p
                  FROM documents)
            WHERE length(trim(p)) >= 1
        ),
        norm AS (
            SELECT doc_id, md5(p) AS h, length(p) AS len FROM paras
        ),
        freq AS (SELECT h, COUNT(*) AS n FROM norm GROUP BY h)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_paras,
               CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_paras,
               CAST(SUM(len) AS BIGINT) AS chars_total,
               CAST(SUM(CASE WHEN n > 1 THEN len ELSE 0 END) AS BIGINT)
                   AS chars_dup
        FROM norm JOIN freq USING (h)
        GROUP BY doc_id
    """,
)
def paragraph_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.paragraph_dedup_stats(documents, delim=" table ")


@register(
    "partname_edit_near_dups",
    op_ids="beyond-reference entity-resolution near-dup pairing by "
    "EDIT DISTANCE with length-key blocking — the string-grain "
    "similarity the token/shingle family cannot express (a typo'd "
    "SKU shares no shingles; levenshtein is the classic ER verify): "
    "probe side emits each distinct name into the <= 2 length blocks "
    "covering [len-d, len+d] (width >= 2d+1 guarantees completeness "
    "with zero duplicate pairs), build side keeps its own block, so "
    "the quadratic work is per-block, never corpus-wide; names "
    "collapse to (name, count) map-side before the join",
    description="distinct part-name pairs within edit distance 3, "
    "found via length-blocked levenshtein with record counts per "
    "name — the entity-resolution dedup verify",
    oracle="""
        WITH names AS (
            SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM part GROUP BY 1
        )
        SELECT a.nm AS name_a, b.nm AS name_b,
               CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS edit_dist,
               a.cnt AS n_recs_a, b.cnt AS n_recs_b
        FROM names a JOIN names b ON a.nm < b.nm
        WHERE abs(length(a.nm) - length(b.nm)) <= 3
          AND levenshtein(a.nm, b.nm) <= 3
    """,
)
def partname_edit_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = load(spark, sf_dir, "part")
    return dedup.length_blocked_edit_pairs(
        part, name_col="p_name", max_dist=3
    )


@register(
    "simhash_hamming_near_dups",
    op_ids="beyond-reference SimHash near-dup PAIRING (Manku/Google "
    "recipe — completes the simhash family: the sketch query only "
    "fingerprints): 32-bit sketch split into 4 contiguous 8-bit "
    "bands; pigeonhole guarantees hamming <= 3 pairs agree on some "
    "band, so candidates come from a band-keyed self-equi-join "
    "(expected n/256 per bucket; production 64-bit/16-bit bands -> "
    "n/65536) and one bit_count(xor) verify — never all-pairs, "
    "exact vs the naive join",
    description="document pairs whose 32-bit simhash fingerprints "
    "differ in at most 3 bits — banded candidate generation + exact "
    "Hamming verify",
    oracle="""
        WITH tokens AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                              x -> x <> '')) AS tok
            FROM documents
        ),
        votes AS (
            SELECT doc_id, b.bit,
                   CASE WHEN strpos('89abcdef',
                                    substring(md5(tok), b.bit + 1, 1)) > 0
                        THEN 1 ELSE -1 END AS vote
            FROM tokens, (SELECT unnest(generate_series(0, 31)) AS bit) b
        ),
        sums AS (SELECT doc_id, bit, SUM(vote) AS s FROM votes GROUP BY 1, 2),
        sk AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << bit ELSE 0 END)
                        AS BIGINT) AS sh
            FROM sums GROUP BY doc_id
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        FROM sk a JOIN sk b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """,
)
def simhash_hamming_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.simhash_band_near_dups(
        documents, bits=32, bands=4, max_hamming=3
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0):
    (embeddings,) = load(spark, sf_dir, "embeddings")
    row = embeddings.filter(F.col("vec_id") == vec_id).select("embedding").first()
    return F.array(*[F.lit(float(v)) for v in row.embedding])


@register(
    "cosine_topk_bruteforce",
    op_ids="beyond-reference ANN baseline (exact cosine top-k scan)",
    description="top-10 cosine neighbors of vec 0, exact full scan",
    oracle="""
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        dots AS (
            SELECT vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y
                  FROM embeddings e, q)
            GROUP BY vec_id
        )
        SELECT vec_id, ROUND(dot / (sqrt(na) * sqrt(nq)), 6) + 0.0 AS cosine
        FROM dots ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(embeddings, _query_vec(spark, sf_dir), k=10)


def _planes_sql_values(n_planes: int = 8, dim: int = 64) -> str:
    planes = similarity.plane_signs(n_planes, dim)
    rows = ", ".join(
        f"({p}, [{', '.join(str(s) for s in signs)}])" for p, signs in enumerate(planes)
    )
    return f"planes(p, s) AS (VALUES {rows})"


@register(
    "ann_lsh_buckets",
    op_ids="beyond-reference ANN scale path (hyperplane LSH bucketing)",
    description="LSH bucket occupancy: 8 deterministic ±1 hyperplanes -> 256 buckets",
    oracle=f"""
        WITH {_planes_sql_values()},
        comps AS (
            SELECT vec_id, p, SUM(CAST(x AS DOUBLE) * CAST(sv AS DOUBLE)) AS dot
            FROM (SELECT e.vec_id, pl.p, unnest(e.embedding) AS x, unnest(pl.s) AS sv
                  FROM embeddings e, planes pl)
            GROUP BY vec_id, p
        ),
        buckets AS (
            SELECT vec_id,
                   SUM(CASE WHEN dot > 0 THEN 1::BIGINT << p ELSE 0 END) AS bucket
            FROM comps GROUP BY vec_id
        )
        SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_vectors
        FROM buckets GROUP BY bucket
    """,
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return (
        similarity.lsh_hyperplane_buckets(embeddings, n_planes=8, dim=64)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


@register(
    "ann_bucketed_topk",
    op_ids="beyond-reference ANN probe (bucket-pruned cosine top-k)",
    description="top-10 neighbors of vec 0 scored only within its LSH bucket",
    oracle=f"""
        WITH {_planes_sql_values()},
        comps AS (
            SELECT vec_id, p, SUM(CAST(x AS DOUBLE) * CAST(sv AS DOUBLE)) AS dot
            FROM (SELECT e.vec_id, pl.p, unnest(e.embedding) AS x, unnest(pl.s) AS sv
                  FROM embeddings e, planes pl)
            GROUP BY vec_id, p
        ),
        buckets AS (
            SELECT vec_id,
                   SUM(CASE WHEN dot > 0 THEN 1::BIGINT << p ELSE 0 END) AS bucket
            FROM comps GROUP BY vec_id
        ),
        qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
        cand AS (SELECT e.* FROM embeddings e
                 JOIN buckets b ON e.vec_id = b.vec_id
                 JOIN qb ON b.bucket = qb.bucket),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        dots AS (
            SELECT vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT c.vec_id, unnest(c.embedding) AS x, unnest(q.qe) AS y
                  FROM cand c, q)
            GROUP BY vec_id
        )
        SELECT vec_id, ROUND(dot / (sqrt(na) * sqrt(nq)), 6) + 0.0 AS cosine
        FROM dots ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
)
def ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.ann_bucketed_topk(
        embeddings, _query_vec(spark, sf_dir), n_planes=8, dim=64, k=10
    )


@register(
    "knn_join_bucketed",
    op_ids="beyond-reference batch kNN JOIN (kNN-graph build: every "
    "vector's top-k bucket-mates in ONE distributed job — bucketed "
    "self-join + per-query rank window, not a driver loop of probes)",
    description="top-3 cosine neighbors per vector among its LSH "
    "bucket-mates: the all-queries-at-once ANN shape curation and "
    "graph-clustering pipelines run over the whole corpus",
    oracle=f"""
        WITH {_planes_sql_values()},
        comps AS (
            SELECT vec_id, p, SUM(CAST(x AS DOUBLE) * CAST(sv AS DOUBLE)) AS dot
            FROM (SELECT e.vec_id, pl.p, unnest(e.embedding) AS x, unnest(pl.s) AS sv
                  FROM embeddings e, planes pl)
            GROUP BY vec_id, p
        ),
        buckets AS (
            SELECT vec_id,
                   SUM(CASE WHEN dot > 0 THEN 1::BIGINT << p ELSE 0 END) AS bucket
            FROM comps GROUP BY vec_id
        ),
        pairs AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        ),
        scored AS (
            SELECT a_id, b_id,
                   ROUND(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                         / (sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                            * sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))), 6)
                       + 0.0 AS cosine
            FROM (SELECT p.a_id, p.b_id, unnest(ea.embedding) AS x,
                         unnest(eb.embedding) AS y
                  FROM pairs p
                  JOIN embeddings ea ON ea.vec_id = p.a_id
                  JOIN embeddings eb ON eb.vec_id = p.b_id)
            GROUP BY a_id, b_id
        )
        SELECT a_id, b_id, cosine, CAST(rank AS INTEGER) AS rank
        FROM (SELECT a_id, b_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY a_id
                                        ORDER BY cosine DESC, b_id ASC) AS rank
              FROM scored)
        WHERE rank <= 3
    """,
)
def knn_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.knn_join_bucketed(embeddings, n_planes=8, dim=64, k=3)


@register(
    "hard_negative_pairs",
    op_ids="beyond-reference contrastive hard-negative mining (per-anchor "
    "top similar-but-below-threshold bucket-mates: the decision-boundary "
    "negatives that carry gradient signal; threshold filter before the "
    "rank window)",
    description="2 hardest negatives per anchor: LSH bucket-mates with "
    "cosine < 0.4, ranked by cosine descending — same bucketed plan as "
    "the kNN join, opposite side of the threshold",
    oracle=f"""
        WITH {_planes_sql_values()},
        comps AS (
            SELECT vec_id, p, SUM(CAST(x AS DOUBLE) * CAST(sv AS DOUBLE)) AS dot
            FROM (SELECT e.vec_id, pl.p, unnest(e.embedding) AS x, unnest(pl.s) AS sv
                  FROM embeddings e, planes pl)
            GROUP BY vec_id, p
        ),
        buckets AS (
            SELECT vec_id,
                   SUM(CASE WHEN dot > 0 THEN 1::BIGINT << p ELSE 0 END) AS bucket
            FROM comps GROUP BY vec_id
        ),
        pairs AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        ),
        scored AS (
            SELECT a_id, b_id,
                   ROUND(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                         / (sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                            * sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))), 6)
                       + 0.0 AS cosine
            FROM (SELECT p.a_id, p.b_id, unnest(ea.embedding) AS x,
                         unnest(eb.embedding) AS y
                  FROM pairs p
                  JOIN embeddings ea ON ea.vec_id = p.a_id
                  JOIN embeddings eb ON eb.vec_id = p.b_id)
            GROUP BY a_id, b_id
        )
        SELECT a_id, b_id, cosine, CAST(rank AS INTEGER) AS rank
        FROM (SELECT a_id, b_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY a_id
                                        ORDER BY cosine DESC, b_id ASC) AS rank
              FROM scored WHERE cosine < 0.4)
        WHERE rank <= 2
    """,
)
def hard_negative_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.hard_negative_pairs(
        embeddings, n_planes=8, dim=64, pos_threshold=0.4, k=2
    )


@register(
    "ann_multiprobe_topk",
    op_ids="beyond-reference multi-probe LSH (Lv et al. VLDB'07): probe "
    "the query bucket plus every 1-bit-flip neighbor — the standard "
    "recall repair for hyperplane LSH",
    description="top-10 neighbors of vec 0 scored across its LSH bucket "
    "and all Hamming-distance-1 buckets (9 of 256); candidate filter is "
    "pure bit arithmetic, ranking is exact cosine",
    oracle=f"""
        WITH {_planes_sql_values()},
        comps AS (
            SELECT vec_id, p, SUM(CAST(x AS DOUBLE) * CAST(sv AS DOUBLE)) AS dot
            FROM (SELECT e.vec_id, pl.p, unnest(e.embedding) AS x, unnest(pl.s) AS sv
                  FROM embeddings e, planes pl)
            GROUP BY vec_id, p
        ),
        buckets AS (
            SELECT vec_id,
                   SUM(CASE WHEN dot > 0 THEN 1::BIGINT << p ELSE 0 END) AS bucket
            FROM comps GROUP BY vec_id
        ),
        qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
        cand AS (SELECT e.* FROM embeddings e
                 JOIN buckets b ON e.vec_id = b.vec_id
                 JOIN qb ON bit_count(xor(b.bucket, qb.bucket)) <= 1),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        dots AS (
            SELECT vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT c.vec_id, unnest(c.embedding) AS x, unnest(q.qe) AS y
                  FROM cand c, q)
            GROUP BY vec_id
        )
        SELECT vec_id, ROUND(dot / (sqrt(na) * sqrt(nq)), 6) + 0.0 AS cosine
        FROM dots ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
)
def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.ann_multiprobe_topk(
        embeddings, _query_vec(spark, sf_dir), n_planes=8, dim=64, k=10, max_flips=1
    )


@register(
    "embedding_near_dups",
    op_ids="beyond-reference embedding-cosine near-dup pairs (LSH candidates + exact verify)",
    description="vector pairs sharing an LSH bucket with cosine >= 0.4",
    oracle=f"""
        WITH {_planes_sql_values()},
        comps AS (
            SELECT vec_id, p, SUM(CAST(x AS DOUBLE) * CAST(sv AS DOUBLE)) AS dot
            FROM (SELECT e.vec_id, pl.p, unnest(e.embedding) AS x, unnest(pl.s) AS sv
                  FROM embeddings e, planes pl)
            GROUP BY vec_id, p
        ),
        buckets AS (
            SELECT vec_id,
                   SUM(CASE WHEN dot > 0 THEN 1::BIGINT << p ELSE 0 END) AS bucket
            FROM comps GROUP BY vec_id
        ),
        pairs AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM buckets a JOIN buckets b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        ),
        scored AS (
            SELECT a_id, b_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
            FROM (SELECT p.a_id, p.b_id, unnest(ea.embedding) AS x, unnest(eb.embedding) AS y
                  FROM pairs p
                  JOIN embeddings ea ON ea.vec_id = p.a_id
                  JOIN embeddings eb ON eb.vec_id = p.b_id)
            GROUP BY a_id, b_id
        )
        SELECT a_id, b_id, ROUND(dot / (sqrt(na) * sqrt(nb)), 6) AS cosine
        FROM scored
        WHERE ROUND(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.4
    """,
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(
        embeddings, n_planes=8, dim=64, threshold=0.4
    )


_IVF_ASSIGN_CTE = """
    cents AS (SELECT vec_id AS cell_id, embedding AS cv FROM embeddings
              WHERE vec_id < 8),
    cellscore AS (
        SELECT vec_id, cell_id,
               ROUND(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                     / (sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                        * sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))), 6) AS cos
        FROM (SELECT e.vec_id, c.cell_id, unnest(e.embedding) AS x, unnest(c.cv) AS y
              FROM embeddings e, cents c)
        GROUP BY vec_id, cell_id
    ),
    assign AS (
        SELECT vec_id, cell_id FROM (
            SELECT vec_id, cell_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, cell_id ASC) AS rn
            FROM cellscore) WHERE rn = 1
    )
"""


@register(
    "ann_ivf_cells",
    op_ids="beyond-reference IVF index build (centroid cell assignment)",
    description="IVF cell occupancy: argmax-cosine assignment to 8 seed centroids",
    oracle=f"WITH {_IVF_ASSIGN_CTE} SELECT cell_id, COUNT(*) AS n_vectors FROM assign GROUP BY cell_id",
)
def ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return (
        similarity.ivf_assign(embeddings, n_centroids=8)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


@register(
    "ann_ivf_topk",
    op_ids="beyond-reference IVF probe (cell-pruned cosine top-k)",
    description="top-10 neighbors of vec 0 scored only within its IVF cell (nprobe=1)",
    oracle=f"""
        WITH {_IVF_ASSIGN_CTE},
        qcell AS (SELECT cell_id FROM assign WHERE vec_id = 0),
        cand AS (SELECT e.* FROM embeddings e
                 JOIN assign a ON e.vec_id = a.vec_id
                 JOIN qcell ON a.cell_id = qcell.cell_id),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        dots AS (
            SELECT vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT c.vec_id, unnest(c.embedding) AS x, unnest(q.qe) AS y
                  FROM cand c, q)
            GROUP BY vec_id
        )
        SELECT vec_id, ROUND(dot / (sqrt(na) * sqrt(nq)), 6) + 0.0 AS cosine
        FROM dots ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        embeddings, _query_vec(spark, sf_dir), query_id=0, n_centroids=8, k=10
    )


@register(
    "embedding_group_centroids",
    op_ids="beyond-reference label-conditioned embedding centroids "
    "(class prototypes: per-(label, dim) decimal-exact mean — feeds "
    "few-shot heads, per-domain IVF seeds, embedding-drift monitors; "
    "shuffle bounded by labels x dims, not corpus size)",
    description="per-language mean document embedding: vec_id joined to "
    "doc metadata, posexplode to (lang, dim), exact decimal sum, one "
    "6dp double division — 64 centroid components per language",
    oracle="""
        WITH j AS (
            SELECT d.lang, e.embedding
            FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        ),
        x AS (
            SELECT lang, i - 1 AS pos,
                   CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,12)) AS val
            FROM j, (SELECT unnest(generate_series(1, 64)) AS i)
        )
        SELECT lang, CAST(pos AS INTEGER) AS pos,
               round(CAST(SUM(val) AS DOUBLE) / COUNT(*), 6) + 0.0 AS centroid,
               COUNT(*) AS n_vectors
        FROM x GROUP BY lang, pos
    """,
)
def embedding_group_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    embeddings, documents = load(spark, sf_dir, "embeddings", "documents")
    labeled = embeddings.join(
        documents.select(F.col("doc_id").alias("vec_id"), "lang"), on="vec_id"
    )
    return similarity.group_centroids(labeled, label_col="lang")


@register(
    "semantic_dedup_semdedup",
    op_ids="beyond-reference SemDeDup semantic deduplication "
    "(arXiv:2303.09540: cluster embeddings, drop within-cluster "
    "cosine-near-duplicates keeping the lowest id — cell-bucketed "
    "self-join, never all-pairs)",
    description="kept vectors after SemDeDup at cosine>=0.35 over the 8 "
    "deterministic IVF cells: a vector is dropped iff some lower-id "
    "vector in its cell is cosine-similar above threshold",
    oracle=f"""
        WITH {_IVF_ASSIGN_CTE},
        pairs AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM assign a JOIN assign b
              ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
        ),
        scored AS (
            SELECT a_id, b_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
            FROM (SELECT p.a_id, p.b_id, unnest(ea.embedding) AS x,
                         unnest(eb.embedding) AS y
                  FROM pairs p
                  JOIN embeddings ea ON ea.vec_id = p.a_id
                  JOIN embeddings eb ON eb.vec_id = p.b_id)
            GROUP BY a_id, b_id
        ),
        dups AS (
            SELECT DISTINCT b_id FROM scored
            WHERE ROUND(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.35
        )
        SELECT a.vec_id, a.cell_id
        FROM assign a
        WHERE a.vec_id NOT IN (SELECT b_id FROM dups)
    """,
)
def semantic_dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(embeddings, n_centroids=8, threshold=0.35)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "token_stats",
    op_ids="beyond-reference token counting (whitespace + BPE-ish regex)",
    description="char/whitespace-token/BPE-ish-token counts per document",
    oracle=r"""
        SELECT doc_id, length(text) AS n_chars,
               len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_ws_tokens,
               len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens
        FROM documents
    """,
)
def token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.token_stats(documents)


@register(
    "quality_scores",
    op_ids="beyond-reference quality scoring (integer-exact heuristics)",
    description="length/punct/stopword/token-length quality features + 0-10 score",
    oracle=r"""
        WITH feats AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
                   length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
                   len(list_filter(string_split_regex(text, '\s+'),
                                   x -> list_contains(['the','a','of','and','is'], lower(x)))) AS n_stop,
                   COALESCE(list_sum(list_transform(
                       list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
                       x -> length(x))), 0) AS sum_tok_len
            FROM documents
        )
        SELECT doc_id, n_chars, n_tokens, n_punct, n_stop,
               CAST(sum_tok_len AS BIGINT) AS sum_tok_len,
               (CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 4 ELSE 0 END
                + CASE WHEN n_punct * 10 < n_chars THEN 2 ELSE 0 END
                + CASE WHEN n_stop > 0 THEN 2 ELSE 0 END
                + CASE WHEN sum_tok_len >= 3 * n_tokens AND sum_tok_len <= 10 * n_tokens
                       THEN 2 ELSE 0 END) AS quality_decile
        FROM feats
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.quality_score(documents)


@register(
    "gopher_quality_gates",
    op_ids="beyond-reference hard quality gates (the published "
    "Gopher-rule pre-filter recipe: word-count band, mean word "
    "length, alphabetic-word fraction, symbol-to-word ratio, "
    "two-of-eight stopword presence) — every threshold an integer "
    "cross-multiplication, map-only, no shuffle",
    description="per-document Gopher rule gates: integer counts, one "
    "boolean per rule, and the pass_gopher conjunction — the hard "
    "REJECT filter applied before any model scoring",
    oracle=r"""
        WITH toks_g AS (
            SELECT doc_id, text,
                   list_filter(string_split_regex(text, '\s+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        feats_g AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   CAST(COALESCE(list_sum(list_transform(toks,
                        x -> length(x))), 0) AS BIGINT) AS sum_tok_len,
                   CAST(len(list_filter(toks,
                        x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT)
                       AS n_alpha_words,
                   CAST((length(text) - length(replace(text, '#', '')))
                        + (length(text) - length(replace(text, '…', '')))
                        AS BIGINT) AS n_symbols,
                   CAST(len(list_intersect(
                        list_distinct(list_transform(toks, x -> lower(x))),
                        ['the','be','to','of','and','that','have','with']))
                        AS BIGINT) AS n_stop_hits
            FROM toks_g
        )
        SELECT doc_id, n_words, n_alpha_words, n_symbols, n_stop_hits,
               n_words >= 50 AND n_words <= 100000 AS gate_word_count,
               sum_tok_len >= 3 * n_words
                   AND sum_tok_len <= 10 * n_words AS gate_mean_word_len,
               5 * n_alpha_words >= 4 * n_words AS gate_alpha_ratio,
               10 * n_symbols <= n_words AS gate_symbol_ratio,
               n_stop_hits >= 2 AS gate_stopwords,
               (n_words >= 50 AND n_words <= 100000)
                   AND (sum_tok_len >= 3 * n_words
                        AND sum_tok_len <= 10 * n_words)
                   AND 5 * n_alpha_words >= 4 * n_words
                   AND 10 * n_symbols <= n_words
                   AND n_stop_hits >= 2 AS pass_gopher
        FROM feats_g
    """,
)
def gopher_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.gopher_gates(documents)


@register(
    "type_token_ratio",
    op_ids="beyond-reference lexical-diversity scoring (type-token "
    "ratio + hapax fraction over the term-frequency grain): explode "
    "-> map-side-combined (doc, token) groupBy -> per-doc aggregate "
    "-> equi left-join back for empty docs; ratios are single double "
    "divisions of exact counts",
    description="per-document lexical diversity: token/type/hapax "
    "counts, type-token ratio and hapax fraction — low TTR flags "
    "template/spam text the line/ngram repetition detectors miss",
    oracle=r"""
        WITH toks_t AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> x <> '')) AS tok
            FROM documents
        ),
        tf_t AS (
            SELECT doc_id, tok, COUNT(*) AS c FROM toks_t GROUP BY 1, 2
        ),
        per_t AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hapax
            FROM tf_t GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(n_tokens, 0) AS n_tokens,
               COALESCE(n_types, 0) AS n_types,
               COALESCE(n_hapax, 0) AS n_hapax,
               CASE WHEN COALESCE(n_tokens, 0) = 0 THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               END AS ttr,
               CASE WHEN COALESCE(n_types, 0) = 0 THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE)
               END AS hapax_ratio
        FROM documents d LEFT JOIN per_t USING (doc_id)
    """,
)
def type_token_ratio_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.type_token_ratio(documents)


@register(
    "model_quality_classifier",
    op_ids="beyond-reference model-based quality filtering (fastText/"
    "CCNet-shape: hashing-trick bag-of-words features -> linear margin "
    "-> sigmoid score -> keep flag; weights hash-derived so serving "
    "needs no join)",
    description="hashed-feature linear quality classifier over documents: "
    "256 feature buckets, deterministic stand-in weight vector, "
    "decimal-exact margin sum, 9dp-rounded margin through the sigmoid",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM documents
        ),
        b AS (
            SELECT doc_id,
                   {_hex_int_sql("md5('hlq-v1|' || tok)", 4)} % 256 AS bucket
            FROM toks
        ),
        w AS (
            SELECT doc_id,
                   CAST(round(CAST({_hex_int_sql("md5('hlq-v1|w|' || CAST(bucket AS VARCHAR))", 6)} AS DOUBLE)
                              / 16777216.0 * 2 - 1, 6) AS DECIMAL(12,6)) AS w
            FROM b
        ),
        agg AS (
            SELECT doc_id, SUM(w) AS sw, COUNT(*) AS n_tokens
            FROM w GROUP BY doc_id
        ),
        m AS (
            SELECT d.doc_id,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   round(COALESCE(CAST(a.sw AS DOUBLE) / a.n_tokens, 0.0), 9) AS margin
            FROM documents d LEFT JOIN agg a USING (doc_id)
        )
        SELECT doc_id, n_tokens, margin,
               round(1.0 / (1.0 + exp(-margin)), 6) + 0.0 AS quality_score,
               round(1.0 / (1.0 + exp(-margin)), 6) + 0.0 >= 0.5 AS keep
        FROM m
    """,
)
def model_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    )


def _lang_id_oracle() -> str:
    score_exprs = ",\n               ".join(
        f"len(list_intersect(toks, [{', '.join(repr(m) for m in markers)}])) AS score_{lang}"
        for lang, markers in text.LANG_MARKERS.items()
    )
    langs = list(text.LANG_MARKERS)
    greatest = f"greatest({', '.join('score_' + l for l in langs)})"
    case = "CASE WHEN " + f"{greatest} = 0 THEN 'und' "
    for lang in langs:
        case += f"WHEN score_{lang} = {greatest} THEN '{lang}' "
    case += "END"
    return rf"""
        WITH toks_t AS (
            SELECT doc_id,
                   list_distinct(list_filter(string_split_regex(lower(text), '\s+'),
                                             x -> x <> '')) AS toks
            FROM documents
        ),
        scored AS (
            SELECT doc_id,
               {score_exprs}
            FROM toks_t
        )
        SELECT doc_id, {', '.join('score_' + l for l in langs)},
               {case} AS pred_lang
        FROM scored
    """


@register(
    "lang_id_predictions",
    op_ids="beyond-reference language ID (stopword-marker heuristic)",
    description="per-language marker scores + deterministic argmax prediction",
    oracle=_lang_id_oracle(),
)
def lang_id_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.lang_id(documents)


@register(
    "doc_fingerprints",
    op_ids="beyond-reference document fingerprinting (content + min-shingle hash)",
    description="md5 of normalized text + minimum hashed char shingle",
    oracle=rf"""
        SELECT doc_id,
               MD5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                       '\s+', ' ', 'g'))) AS content_fingerprint,
               list_aggregate(list_transform(
                   generate_series(1, greatest(length(text) - {SHINGLE_K - 1}, 1)),
                   i -> md5(substring(text, i, {SHINGLE_K}))), 'min') AS min_shingle_hash
        FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.fingerprint(documents, k=SHINGLE_K)


@register(
    "corpus_curation_pipeline",
    op_ids="beyond-reference composed curation: quality filter -> exact dedup -> per-source stats",
    description="end-to-end curation pass: quality-gate docs, keep one copy per fingerprint, roll up per source/lang",
    oracle=r"""
        WITH feats AS (
            SELECT doc_id, source, lang, text,
                   length(text) AS n_chars,
                   length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
            FROM documents
        ),
        gated AS (
            SELECT * FROM feats
            WHERE n_chars BETWEEN 100 AND 20000 AND n_punct * 10 < n_chars
        ),
        deduped AS (
            SELECT MIN(doc_id) AS doc_id, MD5(text) AS fp,
                   MIN(source) AS source, MIN(lang) AS lang,
                   MIN(n_chars) AS n_chars
            FROM gated GROUP BY MD5(text)
        )
        SELECT source, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM deduped GROUP BY source, lang
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed shape a training-data pass actually runs: cheap
    integer-exact quality gates, then exact dedup keyed on the content
    hash (one shuffle on the 32-char fingerprint — doc text never
    shuffles), then the reporting rollup. min(doc_id) picks the
    deterministic representative; min(source/lang) is exact because
    exact duplicates agree on them only by accident — the oracle uses
    the same MIN so both engines resolve ties identically."""
    (documents,) = load(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    gated = documents.filter(
        n_chars.between(100, 20000) & (n_punct * 10 < n_chars)
    )
    deduped = (
        gated.select(
            "doc_id", "source", "lang", F.length("text").alias("n_chars"),
            F.md5("text").alias("fp"),
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("source").alias("source"),
            F.min("lang").alias("lang"),
            F.min("n_chars").alias("n_chars"),
        )
    )
    return deduped.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# multimodal + streaming twins
# ---------------------------------------------------------------------------


@register(
    "binary_media_meta",
    op_ids="beyond-reference multimodal columns (binary payload + typed metadata)",
    description="documents wrapped as binary media; metadata projection never reads payloads",
    oracle="""
        SELECT doc_id AS media_id, 'text/plain' AS mime,
               octet_length(encode(text)) AS n_bytes, source
        FROM documents
    """,
)
def binary_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    media = multimodal.as_media_table(documents)
    return media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.source").alias("source"),
    )


@register(
    "media_feature_extract",
    op_ids="beyond-reference multimodal decode/feature plumbing "
    "(mapInPandas over REAL PNG payloads; stdlib header decode)",
    description="documents wrapped as real zlib-built PNGs whose "
    "dimensions derive from (doc_id, n_chars); extract_features "
    "header-decodes them (no codec library), so width/height/"
    "decoded_real have an exact SQL oracle",
    oracle="""
        SELECT doc_id AS media_id,
               CAST(1 + doc_id % 64 AS INTEGER) AS width,
               CAST(1 + coalesce(n_chars, 0) % 64 AS INTEGER) AS height,
               TRUE AS decoded_real
        FROM documents
    """,
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    media = multimodal.as_png_media_table(documents)
    return multimodal.extract_features(media).select(
        "media_id", "width", "height", "decoded_real"
    )


@register(
    "media_frame_sample",
    op_ids="beyond-reference multimodal frame sampling (1->N Arrow flatMap)",
    description="per-frame rows from binary payloads (stubbed demux; exact byte-window oracle)",
    oracle="""
        WITH lens AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
        SELECT doc_id AS media_id,
               CAST(unnest(generate_series(0, (n - 1) // 256)) AS BIGINT) AS frame_index,
               CAST(least(64, n - unnest(generate_series(0, (n - 1) // 256)) * 256) AS BIGINT)
                   AS n_frame_bytes
        FROM lens WHERE n > 0
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    media = multimodal.as_media_table(documents)
    frames = multimodal.frame_sample(media, every_n=4, frame_bytes=64)
    return frames.select(
        "media_id",
        F.col("frame_index").cast("long").alias("frame_index"),
        "n_frame_bytes",
    )


@register(
    "approx_distinct_users",
    op_ids="beyond-reference HLL sketch (approx_count_distinct — the 100TB "
    "distinct path), hash-verifiable via a tolerance-band oracle "
    "(VERDICT r5 item 2): the sketch estimate itself is engine-specific, "
    "but |est − exact| ≤ 5σ·exact is an engine-INDEPENDENT boolean both "
    "engines can state — Spark computes it from the real sketch, DuckDB "
    "asserts it from the published HLL++ error bound",
    description="HyperLogLog++ distinct users per event type, emitted as "
    "an accuracy check: exact count plus a 5-sigma error-band boolean "
    "(rsd=0.02 -> band 10% + 3 absolute slack for tiny cardinalities)",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS hll_within_5sigma
        FROM events GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production form is sketch-only (never scans for the exact
    count); this registered twin ALSO computes the exact distinct so
    the error-band boolean is checkable — same pattern as
    ``ann_recall_eval``: the eval pays for ground truth, the pipeline
    doesn't. Integer-only band arithmetic (|est−exact|·10 ≤ exact+30
    ⇔ |est−exact| ≤ 0.10·exact+3) keeps the boolean bit-stable."""
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.count_distinct("user_id")
            )
            * 10
            <= F.count_distinct("user_id") + 30
        ).alias("hll_within_5sigma"),
    )


@register(
    "hll_sketch_merge_rollup",
    op_ids="beyond-reference MERGEABLE HLL sketch rollup (DataSketches "
    "hll_sketch_agg per (event_type, day) -> hll_union_agg at query "
    "time — the materialize-partials-then-merge distinct pattern a "
    "100 TB pipeline stores daily sketches for; raw ids never cross "
    "the wire past the first partial agg; no SQL oracle: sketch "
    "estimates are engine-specific)",
    description="distinct users per event type via per-day HLL "
    "sketches merged at query time (plus how many daily partials "
    "merged), emitted as an accuracy check: exact distinct plus a "
    "6-sigma error-band boolean (lgK=12 -> rse 1.04/sqrt(4096) ~ "
    "1.63%, band 10% + 3 absolute slack)",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_partials,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS merged_within_6sigma
        FROM events GROUP BY event_type
    """,
)
def hll_sketch_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-band twin (VERDICT r5 item 2): the merged-sketch
    estimate is engine-specific, so the registered form checks it
    against an exact distinct computed alongside — the materialized
    daily partials + union-at-query-time machinery is untouched
    (``operators/sketches.py:hll_partitioned_rollup``); only the final
    projection trades the raw estimate for the checkable boolean."""
    from nhl_data_warehouse_spark.operators.sketches import hll_partitioned_rollup

    (events,) = load(spark, sf_dir, "events")
    rollup = hll_partitioned_rollup(
        events,
        group_col="event_type",
        partition_col=F.to_date("ts"),
        id_col="user_id",
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return rollup.join(exact, "event_type").select(
        "event_type",
        "n_partials",
        "exact_users",
        (
            F.abs(F.col("est_distinct") - F.col("exact_users")) * 10
            <= F.col("exact_users") + 30
        ).alias("merged_within_6sigma"),
    )


@register(
    "approx_value_percentiles",
    op_ids="beyond-reference percentile sketch (approx_percentile, "
    "single-pass, mergeable), hash-verifiable via a rank-error-band "
    "oracle (VERDICT r5 item 2): the estimate is engine-specific, but "
    "'the estimate's exact rank is within the published 4n/accuracy "
    "guard of ceil(p*n)' is an engine-independent boolean",
    description="approximate p50/p95 of event value per type, emitted "
    "as a rank-accuracy check against the exact rank bracket",
    oracle="""
        SELECT event_type,
               COUNT(value) AS n_values,
               TRUE AS p50_in_bounds,
               TRUE AS p95_in_bounds
        FROM events GROUP BY event_type
    """,
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-band check: for estimate e at percentile p over n values,
    rank_lt(e) = |{v < e}| and rank_le(e) = |{v <= e}| must bracket
    the target rank r0 = ceil(p*n) within err = floor(4n/a)+1 (the
    4/a guard from operators/quantiles.py, valid down to tiny groups;
    in exact mode — n < accuracy — the estimate IS the value at rank
    r0, so rank_le >= r0 and rank_lt < r0 hold with err margin to
    spare, ties included). All arithmetic is integer, so the booleans
    are bit-stable. The sketch runs once; the check joins the 5-row
    sketch result back (broadcast) and re-aggregates the rank counts."""
    (events,) = load(spark, sf_dir, "events")
    vals = events.select("event_type", "value").where(F.col("value").isNotNull())
    # Scalar p50/p95 columns, not one array<double>: the driver's pandas
    # canonicalizer cannot hash list cells (CORRECTNESS_r03 err).
    sketch = vals.groupBy("event_type").agg(
        F.approx_percentile(
            "value", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
        ).alias("p50_p95")
    )
    est = sketch.select(
        "event_type",
        F.col("p50_p95")[0].alias("_e50"),
        F.col("p50_p95")[1].alias("_e95"),
    )
    ranks = (
        vals.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum((F.col("value") < F.col("_e50")).cast("long")).alias("_lt50"),
            F.sum((F.col("value") <= F.col("_e50")).cast("long")).alias("_le50"),
            F.sum((F.col("value") < F.col("_e95")).cast("long")).alias("_lt95"),
            F.sum((F.col("value") <= F.col("_e95")).cast("long")).alias("_le95"),
        )
    )
    # integer DIV throughout — no double rounding anywhere in the bands
    err = F.expr("n_values * 4 DIV 10000") + 1
    r50 = F.expr("(n_values + 1) DIV 2")  # ceil(n/2)
    r95 = F.expr("(n_values * 19 + 19) DIV 20")  # ceil(0.95*n)
    return ranks.select(
        "event_type",
        "n_values",
        (
            (F.col("_le50") >= r50 - err) & (F.col("_lt50") < r50 + err)
        ).alias("p50_in_bounds"),
        (
            (F.col("_le95") >= r95 - err) & (F.col("_lt95") < r95 + err)
        ).alias("p95_in_bounds"),
    )


@register(
    "event_hourly_stats",
    op_ids="S5/§2.7 streaming twin (tumbling event-time window, batch form)",
    description="1-hour tumbling window counts + exact value sums per event type",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
)
def event_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.streaming.windows import windowed_event_counts

    (events,) = load(spark, sf_dir, "events")
    out = windowed_event_counts(
        events.withColumn("value", F.col("value").cast("decimal(18,2)")),
        window_duration="1 hour",
    )
    # exact decimal sum inside; double in the final schema (driver W1)
    return out.withColumn("sum_value", F.col("sum_value").cast("double"))


# ---------------------------------------------------------------------------
# deterministic sampling / corpus mix (operators/sampling.py)
# ---------------------------------------------------------------------------

from nhl_data_warehouse_spark.operators import sampling  # noqa: E402


@register(
    "sample_hash_bernoulli",
    op_ids="beyond-reference deterministic sampling (content-hash Bernoulli)",
    description="10% reproducible sample of documents by md5 threshold — "
    "no RNG, stable under data growth, narrow per-row filter",
    oracle=f"""
        SELECT doc_id, lang FROM documents
        WHERE substring(md5('corpus-v1|' || CAST(doc_id AS VARCHAR)), 1, 8)
              < '{sampling.rate_threshold(0.1)}'
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return sampling.hash_sample(
        documents.select("doc_id", "lang"), ["doc_id"], rate=0.1, salt="corpus-v1"
    )


@register(
    "sample_train_val_test_split",
    op_ids="beyond-reference deterministic split assignment (hash ranges)",
    description="disjoint-exhaustive 80/10/10 train/val/test labels by hash "
    "range; recomputable anywhere instead of stored",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN substring(md5('split-v1|' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < '{sampling.rate_threshold(0.8)}' THEN 'train'
                    WHEN substring(md5('split-v1|' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < '{sampling.rate_threshold(0.9)}' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
)
def sample_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return sampling.hash_split(
        documents.select("doc_id"),
        ["doc_id"],
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="split-v1",
    )


@register(
    "sample_group_cap",
    op_ids="beyond-reference per-domain cap (windowed hash-order subsample)",
    description="at most 20 docs per source, chosen by hash order — the "
    "standard unbiased per-domain cap in corpus curation",
    oracle="""
        SELECT doc_id, source FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY source
            ORDER BY md5('cap-v1|' || CAST(doc_id AS VARCHAR)), doc_id) <= 20
    """,
)
def sample_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return sampling.group_cap(
        documents.select("doc_id", "source"),
        "source",
        cap=20,
        id_cols=["doc_id"],
        salt="cap-v1",
    )


@register(
    "sample_rebalance_langs",
    op_ids="beyond-reference corpus-mix rebalancing (in-engine rate solve + hash filter)",
    description="downsample languages to a uniform 20% mix, keeping the "
    "bottleneck language whole; rates solved in-engine, no collect",
    oracle="""
        WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        shares(lang, share) AS (
            VALUES ('en', 0.2), ('de', 0.2), ('es', 0.2), ('fr', 0.2), ('zh', 0.2)
        ),
        rates AS (
            SELECT c.lang,
                   (MIN(n / CAST(share AS DOUBLE)) OVER ())
                     * CAST(share AS DOUBLE) / n AS rate
            FROM counts c JOIN shares s ON c.lang = s.lang
        )
        SELECT d.doc_id, d.lang
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE r.rate >= 1.0
           OR substring(md5('rb-v1|' || CAST(d.doc_id AS VARCHAR)), 1, 8)
              < lpad(lower(to_hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))), 8, '0')
    """,
)
def sample_rebalance_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return sampling.proportional_rebalance(
        documents.select("doc_id", "lang"),
        "lang",
        {"en": 0.2, "de": 0.2, "es": 0.2, "fr": 0.2, "zh": 0.2},
        id_cols=["doc_id"],
        salt="rb-v1",
    )


@register(
    "event_sliding_stats",
    op_ids="§2.7 streaming twin (sliding/hopping event-time window, batch form)",
    description="1-hour windows sliding every 30 minutes: each event lands in "
    "duration/slide overlapping windows (the rate-monitor shape)",
    oracle="""
        SELECT CAST(time_bucket(INTERVAL '30 minutes', ts)
                    - (k * INTERVAL '30 minutes') AS TIMESTAMP) AS window_start,
               event_type, COUNT(*) AS n_events
        FROM events, (SELECT unnest([0, 1]) AS k)
        GROUP BY 1, 2
    """,
)
def event_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.streaming.windows import sliding_event_counts

    (events,) = load(spark, sf_dir, "events")
    return sliding_event_counts(events, "1 hour", "30 minutes")


@register(
    "pii_redaction",
    op_ids="beyond-reference PII scrubbing (typed-placeholder regex redaction + audit counts)",
    description="redact urls/emails/ipv4s/phones to typed placeholders with "
    "per-row audit counts; patterns are in the Java-regex/RE2 portable subset",
    oracle=r"""
        WITH withpii AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@mail.example.com or https://ex.com/d/' || CAST(doc_id AS VARCHAR)
                        || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 tel +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
            FROM documents
        ),
        p1 AS (SELECT doc_id,
                      len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_url,
                      regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g') AS t
               FROM withpii),
        p2 AS (SELECT doc_id, n_url,
                      len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                      regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
               FROM p1),
        p3 AS (SELECT doc_id, n_url, n_email,
                      len(regexp_extract_all(t, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS n_ipv4,
                      regexp_replace(t, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IPV4>', 'g') AS t
               FROM p2),
        p4 AS (SELECT doc_id, n_url, n_email, n_ipv4,
                      len(regexp_extract_all(t, '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS n_phone,
                      regexp_replace(t, '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS t
               FROM p3)
        SELECT doc_id, n_url, n_email, n_ipv4, n_phone, t AS clean_text FROM p4
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    # deterministic synthetic PII derived from doc_id — the testdata
    # corpus itself is PII-free, so seed every row with one span of
    # each type to make the redaction measurable
    withpii = documents.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or https://ex.com/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 tel +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return text.redact_pii(withpii)


@register(
    "cdc_latest_state",
    op_ids="beyond-reference CDC compaction (latest-wins per key + tombstone suppression)",
    description="events replayed as a CDC feed: latest row per user wins; "
    "users whose last event is an 'error' tombstone disappear",
    oracle="""
        SELECT user_id, event_id, ts, event_type, value
        FROM (
            SELECT user_id, event_id, ts, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) versioned
        WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators import cdc

    (events,) = load(spark, sf_dir, "events")
    return cdc.compact_changes(
        events.select("user_id", "event_id", "ts", "event_type", "value"),
        keys=["user_id"],
        seq_cols=["ts", "event_id"],
        op_col="event_type",
        delete_values=("error",),
    )


@register(
    "chi2_term_label_selection",
    op_ids="beyond-reference feature selection: chi-square term-label "
    "association over presence contingencies (top-k characteristic "
    "terms per language — the vocabulary/feature pass of corpus "
    "classifiers; exact integer cells, one fixed-order double ratio)",
    description="top-3 terms per lang by chi2 over the 2x2 doc-presence "
    "contingency, min document frequency 5; ties broken by term",
    oracle="""
        WITH present AS (
            SELECT DISTINCT doc_id, lang, unnest(list_distinct(
                list_filter(string_split(text, ' '), x -> x <> ''))) AS term
            FROM documents
        ),
        n_total AS (SELECT COUNT(*) AS n FROM documents),
        tl AS (SELECT term, lang, COUNT(*) AS a FROM present GROUP BY 1, 2),
        t AS (SELECT term, COUNT(*) AS n_term FROM present GROUP BY 1
              HAVING COUNT(*) >= 5
                 AND COUNT(*) < (SELECT n FROM n_total)),
        lab AS (SELECT lang, COUNT(*) AS n_label FROM documents GROUP BY 1
                HAVING COUNT(*) < (SELECT n FROM n_total)),
        scored AS (
            SELECT tl.lang, tl.term, tl.a AS n_with, t.n_term, lab.n_label,
                   round(CAST(n.n * (tl.a * (n.n - t.n_term - (lab.n_label - tl.a))
                                     - (t.n_term - tl.a) * (lab.n_label - tl.a))
                                  * (tl.a * (n.n - t.n_term - (lab.n_label - tl.a))
                                     - (t.n_term - tl.a) * (lab.n_label - tl.a))
                              AS DOUBLE)
                         / CAST(t.n_term * (n.n - t.n_term) AS DOUBLE)
                         / CAST(lab.n_label * (n.n - lab.n_label) AS DOUBLE), 6)
                     + 0.0 AS chi2
            FROM tl JOIN t USING (term) JOIN lab USING (lang), n_total n
        )
        SELECT lang, term, n_with, n_term, n_label, chi2,
               CAST(rank AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY lang ORDER BY chi2 DESC, term ASC) AS rank
              FROM scored)
        WHERE rank <= 3
    """,
)
def chi2_term_label_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.chi2_term_selection(documents, label_col="lang", k=3, min_df=5)


@register(
    "cdc_apply_roundtrip",
    op_ids="beyond-reference CDC table convergence (apply_changes: "
    "compact the batch, delete tombstoned keys, upsert survivors into "
    "a managed table — the full change-feed -> table materialization)",
    description="orders-derived change batch (updates seq 1, tombstone "
    "deletes seq 2, inserts) applied to a managed target: updated keys "
    "take the new status, deleted keys disappear (a key both inserted "
    "and deleted in one batch compacts to the later delete), untouched "
    "rows survive — final table state hash-matched",
    oracle="""
        WITH base AS (
            SELECT o_orderkey, o_orderstatus FROM orders
            WHERE o_orderkey % 3 <> 0
        ),
        ch AS (
            SELECT o_orderkey, 'UPD' AS o_orderstatus, 1 AS seq, 'U' AS op
            FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 3 <> 0
            UNION ALL
            SELECT o_orderkey, NULL, 2, 'D'
            FROM orders WHERE o_orderkey % 11 = 0
            UNION ALL
            SELECT o_orderkey, 'NEW', 1, 'I'
            FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 = 0
        ),
        latest AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
                FROM ch) WHERE rn = 1
        )
        SELECT o_orderkey, o_orderstatus FROM base
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
        UNION ALL
        SELECT o_orderkey, o_orderstatus FROM latest WHERE op <> 'D'
    """,
)
def cdc_apply_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from nhl_data_warehouse_spark import catalog
    from nhl_data_warehouse_spark.operators import cdc

    (orders,) = load(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    base = orders.select("o_orderkey", "o_orderstatus").filter(key % 3 != 0)
    changes = (
        orders.filter((key % 7 == 0) & (key % 3 != 0)).select(
            "o_orderkey",
            F.lit("UPD").alias("o_orderstatus"),
            F.lit(1).alias("seq"),
            F.lit("U").alias("op"),
        )
        .unionByName(
            orders.filter(key % 11 == 0).select(
                "o_orderkey",
                F.lit(None).cast("string").alias("o_orderstatus"),
                F.lit(2).alias("seq"),
                F.lit("D").alias("op"),
            )
        )
        .unionByName(
            orders.filter((key % 3 == 0) & (key % 5 == 0)).select(
                "o_orderkey",
                F.lit("NEW").alias("o_orderstatus"),
                F.lit(1).alias("seq"),
                F.lit("I").alias("op"),
            )
        )
    )
    catalog.ensure_database(spark, "nhl_suite_cdc")
    table = "nhl_suite_cdc.applied_orders"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/nhl_suite_cdc.db/applied_orders", ignore_errors=True)
    # the initial load is itself a change batch (all inserts, seq 0) so
    # the target carries the change-feed schema end to end
    initial = base.select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(0).alias("seq"),
        F.lit("I").alias("op"),
    )
    cdc.apply_changes(
        spark, table, initial, keys=["o_orderkey"], seq_cols=["seq"], op_col="op"
    )
    cdc.apply_changes(
        spark,
        table,
        changes,
        keys=["o_orderkey"],
        seq_cols=["seq"],
        op_col="op",
    )
    return spark.table(table).select("o_orderkey", "o_orderstatus")


@register(
    "udtf_positional_tokenize",
    op_ids="§2.8 Python UDTF (Spark 4 table function; SQL LATERAL fan-out)",
    description="per-token rows with positions via a Python UDTF — the custom "
    "table-function path; native posexplode is the hot-path twin",
    oracle="""
        SELECT doc_id, i - 1 AS pos, arr[i] AS token
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) s
        WHERE arr[i] <> ''
    """,
)
def udtf_positional_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.functions import udtfs

    (documents,) = load(spark, sf_dir, "documents")
    udtfs.register_all(spark)
    documents.createOrReplaceTempView("docs_udtf")
    return spark.sql(
        "SELECT doc_id, t.pos, t.token "
        "FROM docs_udtf, LATERAL positional_tokenize(text) t"
    )


@register(
    "boilerplate_removal",
    op_ids="beyond-reference cross-document boilerplate removal (sentence doc-frequency filter)",
    description="drop sentences appearing in >10 distinct docs (footers/banners), "
    "reassemble remaining sentences in order — boilerplate synthesized "
    "deterministically since the testdata corpus has none",
    oracle="""
        WITH withboiler AS (
            SELECT doc_id,
                   'Breaking news update. ' || text
                     || '. Subscribe to our newsletter today.'
                     || CASE WHEN doc_id % 2 = 0
                             THEN ' Cookie policy applies to this site.'
                             ELSE '' END AS text
            FROM documents
        ),
        sents AS (
            SELECT doc_id, i AS pos, trim(arr[i]) AS sent
            FROM (SELECT doc_id, string_split_regex(text, '[.!?]') AS arr
                  FROM withboiler),
                 LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) s
            WHERE trim(arr[i]) <> ''
        ),
        freq_ok AS (
            SELECT md5(sent) AS fp FROM sents
            GROUP BY 1 HAVING COUNT(DISTINCT doc_id) <= 10
        ),
        kept AS (
            SELECT s.doc_id, s.pos, s.sent FROM sents s
            JOIN freq_ok f ON md5(s.sent) = f.fp
        )
        SELECT doc_id,
               string_agg(sent, '. ' ORDER BY pos) AS clean_text,
               COUNT(*) AS n_sentences
        FROM kept GROUP BY doc_id
    """,
)
def boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    withboiler = documents.select(
        "doc_id",
        F.concat(
            F.lit("Breaking news update. "),
            F.col("text"),
            F.lit(". Subscribe to our newsletter today."),
            F.when(F.col("doc_id") % 2 == 0, " Cookie policy applies to this site.").otherwise(""),
        ).alias("text"),
    )
    return text.remove_boilerplate(withboiler, max_df=10)


@register(
    "unigram_logprob_scores",
    op_ids="beyond-reference LM-based quality scoring (self-trained unigram, "
    "train-then-score two-pass)",
    description="per-doc mean negative log-probability under the corpus's own "
    "unigram distribution — the perplexity-filter shape with 6dp-rounded "
    "decimal-summed log terms",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM documents
        ),
        vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT SUM(c) AS n FROM vocab),
        lp AS (
            SELECT tok,
                   CAST(round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                        AS DECIMAL(12,6)) AS logp
            FROM vocab, tot
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               -(CAST(SUM(logp) AS DOUBLE)) / COUNT(*) AS avg_neg_logprob
        FROM toks JOIN lp USING (tok)
        GROUP BY doc_id
    """,
)
def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.unigram_logprob_score(documents)


# shared DuckDB fragment: non-empty whitespace tokens per doc
_TOKS_CTE = """
    toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        FROM documents
    )
"""


@register(
    "tfidf_top_terms",
    op_ids="beyond-reference TF-IDF salience (top-k terms per doc, "
    "smoothed idf, decimal-exact ranking)",
    description="top-3 TF-IDF terms per document — keyword extraction "
    "for corpus routing; idf rounded to 6dp decimal so ranks and "
    "hashes are engine-exact",
    oracle=f"""
        WITH {_TOKS_CTE},
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_docs,
                   tf.tf * CAST(round(ln(CAST(n_docs + 1 AS DOUBLE)
                                         / CAST(df_docs + 1 AS DOUBLE)), 6)
                                AS DECIMAL(12,6)) AS tfidf
            FROM tf JOIN dfreq USING (term) CROSS JOIN nd
        )
        SELECT doc_id, term, tf, df_docs,
               CAST(tfidf AS DOUBLE) AS tfidf, term_rank
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY tfidf DESC, term) AS term_rank
              FROM scored)
        WHERE term_rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.tfidf_top_terms(documents, k=3)


@register(
    "ngram_contamination",
    op_ids="beyond-reference benchmark decontamination (word 5-gram "
    "overlap vs a held-out set, broadcast gram join)",
    description="eval-leakage check: share of each corpus doc's "
    "distinct 5-grams that appear in the benchmark subset "
    "(doc_id % 50 == 0); integer cross-multiplied flag at 20%",
    oracle="""
        WITH docs AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS arr
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id, array_to_string(list_slice(arr, i, i + 4), ' ') AS gram
            FROM docs, LATERAL (SELECT unnest(generate_series(1, len(arr) - 4)) AS i)
        ),
        bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
        corpus AS (SELECT * FROM grams WHERE doc_id % 50 <> 0),
        counts AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
        shared AS (
            SELECT doc_id, COUNT(*) AS n_shared
            FROM corpus JOIN bench USING (gram) GROUP BY doc_id
        )
        SELECT c.doc_id, c.n_grams,
               COALESCE(s.n_shared, 0) AS n_shared,
               CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
                   / CAST(c.n_grams AS DOUBLE) AS contamination_ratio,
               CAST(COALESCE(s.n_shared, 0) * 100 >= c.n_grams * 20
                    AS INT) AS is_contaminated
        FROM counts c LEFT JOIN shared s USING (doc_id)
    """,
)
def ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.contamination_check(
        documents, n=5, benchmark_every=50, flag_pct=20
    )


@register(
    "substring_span_contamination_50g",
    op_ids="beyond-reference exact substring decontamination at the "
    "50-gram grain with token-SPAN coverage (VERDICT r8 item 8, "
    "extends ngram_contamination): every shared >= 50-token verbatim "
    "substring is a union of shared 50-grams, so the union of "
    "matched gram spans IS the contaminated region — suffix-automaton "
    "semantics from set ops; md5 gram keys (32-byte join), interval "
    "union as COUNT(DISTINCT covered position), only MATCHED grams "
    "explode",
    description="eval docs (odd doc_id) scored by the fraction of "
    "their tokens covered by some 50-gram appearing verbatim in the "
    "even-doc_id benchmark half; flag at 20% token coverage",
    oracle="""
        WITH docs AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS arr
            FROM documents
        ),
        long_docs AS (
            SELECT doc_id, arr, len(arr) AS n_tokens
            FROM docs WHERE len(arr) >= 50
        ),
        grams AS (
            SELECT doc_id, n_tokens, i,
                   md5(array_to_string(list_slice(arr, i, i + 49), ' ')) AS g
            FROM long_docs,
                 LATERAL (SELECT unnest(generate_series(1, len(arr) - 49)) AS i)
        ),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 2 = 0),
        ev AS (SELECT * FROM grams WHERE doc_id % 2 <> 0),
        counts AS (
            SELECT doc_id, MAX(n_tokens) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_grams
            FROM ev GROUP BY doc_id
        ),
        matched AS (SELECT doc_id, i FROM ev JOIN bench USING (g)),
        nmatch AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched
            FROM matched GROUP BY doc_id
        ),
        covered AS (
            SELECT doc_id, CAST(COUNT(DISTINCT pos) AS BIGINT) AS covered_tokens
            FROM matched,
                 LATERAL (SELECT unnest(generate_series(i, i + 49)) AS pos)
            GROUP BY doc_id
        )
        SELECT c.doc_id, c.n_tokens, c.n_grams,
               COALESCE(m.n_matched, 0) AS n_matched,
               COALESCE(v.covered_tokens, 0) AS covered_tokens,
               CAST(COALESCE(v.covered_tokens, 0) AS DOUBLE)
                   / CAST(c.n_tokens AS DOUBLE) AS covered_frac,
               CAST(COALESCE(v.covered_tokens, 0) * 100 >= c.n_tokens * 20
                    AS INT) AS is_contaminated
        FROM counts c
        LEFT JOIN nmatch m USING (doc_id)
        LEFT JOIN covered v USING (doc_id)
    """,
)
def substring_span_contamination_50g(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.span_contamination(
        documents, n=50, benchmark_mod=2, flag_pct=20
    )


@register(
    "bloom_13g_substring_dedup",
    op_ids="beyond-reference Bloom-accelerated exact substring dedup "
    "at the 13-gram grain (RefinedWeb/CCNet recipe, VERDICT r10 item "
    "5 — the incremental batch-vs-history twin of the 50-gram "
    "decontamination): history's distinct gram md5s build a "
    "deterministic (word,bits) Bloom bitmap relation; each DISTINCT "
    "batch gram probes it narrow (k=3 positions, word-keyed bitmap "
    "join), and ONLY the maybe-seen slice pays the exact verify join "
    "— no false negatives, so the matched-span set is provably "
    "identical to the plain exact join and the oracle is plain SQL; "
    "span coverage via COUNT(DISTINCT position), matched grams only "
    "explode",
    description="batch docs (odd doc_id) scored by the fraction of "
    "their tokens covered by some 13-gram appearing verbatim in the "
    "even-doc_id history half — Bloom prefilter, exact verdicts; "
    "flag at 20% token coverage",
    oracle="""
        WITH docs AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS arr
            FROM documents
        ),
        long_docs AS (
            SELECT doc_id, arr, len(arr) AS n_tokens
            FROM docs WHERE len(arr) >= 13
        ),
        grams AS (
            SELECT doc_id, n_tokens, i,
                   md5(array_to_string(list_slice(arr, i, i + 12), ' ')) AS g
            FROM long_docs,
                 LATERAL (SELECT unnest(generate_series(1, len(arr) - 12)) AS i)
        ),
        hist AS (SELECT DISTINCT g FROM grams WHERE doc_id % 2 = 0),
        batch AS (SELECT * FROM grams WHERE doc_id % 2 <> 0),
        counts AS (
            SELECT doc_id, MAX(n_tokens) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_grams
            FROM batch GROUP BY doc_id
        ),
        matched AS (SELECT doc_id, i FROM batch JOIN hist USING (g)),
        ndup AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_grams
            FROM matched GROUP BY doc_id
        ),
        covered AS (
            SELECT doc_id, CAST(COUNT(DISTINCT pos) AS BIGINT) AS covered_tokens
            FROM matched,
                 LATERAL (SELECT unnest(generate_series(i, i + 12)) AS pos)
            GROUP BY doc_id
        )
        SELECT c.doc_id, c.n_tokens, c.n_grams,
               COALESCE(d.n_dup_grams, 0) AS n_dup_grams,
               COALESCE(v.covered_tokens, 0) AS covered_tokens,
               CAST(COALESCE(v.covered_tokens, 0) AS DOUBLE)
                   / CAST(c.n_tokens AS DOUBLE) AS dup_frac,
               CAST(COALESCE(v.covered_tokens, 0) * 100 >= c.n_tokens * 20
                    AS INT) AS is_flagged
        FROM counts c
        LEFT JOIN ndup d USING (doc_id)
        LEFT JOIN covered v USING (doc_id)
    """,
)
def bloom_13g_substring_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.bloom_span_dedup(
        documents, n=13, history_mod=2, flag_pct=20, m_bits=1 << 20, k=3
    )


@register(
    "source_mix_entropy_by_lang",
    op_ids="beyond-reference corpus-diversity gate: per-language "
    "Shannon entropy (and perplexity = effective source count) of "
    "the SOURCE distribution — the mix-balance scorecard a training "
    "pipeline checks before weighting sources (token_entropy_scores "
    "is the within-document twin; this is the corpus-mix grain). "
    "Determinism: shares are single divisions of exact counts, ln is "
    "6dp-rounded on both engines (the rounded-ln rule), the per-"
    "language fold runs in source order over BOUNDED (lang x source) "
    "cells (the macro-F1 ordered-fold recipe), -0.0 guarded",
    description="per-language source-mix diversity: doc count, "
    "source count, Shannon entropy of the source shares, and "
    "perplexity (effective number of sources) — a skewed mix shows "
    "perplexity far below the source count",
    oracle="""
        WITH smc AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        ),
        smt AS (
            SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_sources
            FROM smc GROUP BY 1
        ),
        terms AS (
            SELECT c.lang, c.source, t.n_docs, t.n_sources,
                   (CAST(c.n AS DOUBLE) / CAST(t.n_docs AS DOUBLE))
                   * round(ln(CAST(c.n AS DOUBLE)
                              / CAST(t.n_docs AS DOUBLE)), 6) AS term
            FROM smc c JOIN smt t USING (lang)
        ),
        ent AS (
            SELECT lang, n_docs, n_sources,
                   -SUM(term ORDER BY source) + 0.0 AS source_entropy
            FROM terms GROUP BY lang, n_docs, n_sources
        )
        SELECT lang, n_docs, n_sources, source_entropy,
               round(exp(source_entropy), 6) + 0.0 AS perplexity
        FROM ent
    """,
)
def source_mix_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    c = documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    terms = c.join(t, on="lang").select(
        "lang",
        "n_docs",
        "n_sources",
        F.struct(
            "source",
            F.expr(
                "(CAST(n AS DOUBLE) / CAST(n_docs AS DOUBLE))"
                " * round(ln(CAST(n AS DOUBLE) / CAST(n_docs AS DOUBLE)), 6)"
            ).alias("term"),
        ).alias("st"),
    )
    folded = terms.groupBy("lang", "n_docs", "n_sources").agg(
        F.sort_array(F.collect_list("st")).alias("ts")
    )
    ent = folded.select(
        "lang",
        "n_docs",
        "n_sources",
        (
            -F.aggregate(
                F.transform("ts", lambda s: s["term"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            + 0.0
        ).alias("source_entropy"),
    )
    return ent.select(
        "lang",
        "n_docs",
        "n_sources",
        "source_entropy",
        (F.round(F.exp("source_entropy"), 6) + 0.0).alias("perplexity"),
    )


@register(
    "source_lang_jsd_pairs",
    op_ids="beyond-reference pairwise source-disagreement gate: "
    "Jensen-Shannon divergence between every SOURCE PAIR over their "
    "language distributions — symmetric and bounded (<= ln 2), the "
    "which-sources-disagree matrix (PSI/KS compare two snapshots of "
    "one numeric column; source_mix_entropy scores one slice alone). "
    "Determinism: shares single divisions of exact counts, 6dp "
    "rounded-ln per term, per-pair fold in category order over the "
    "BOUNDED (pair x lang) grid, 0*ln0 CASE-guarded, -0.0 guarded",
    description="JSD between each pair of document sources over "
    "their language mix, with both doc counts — the redundancy / "
    "complementarity matrix checked before weighting sources",
    oracle="""
        WITH c AS (
            SELECT source AS s, lang AS cat, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        ),
        t AS (SELECT s, CAST(SUM(n) AS BIGINT) AS ns FROM c GROUP BY 1),
        pairs AS (
            SELECT a.s AS source_a, a.ns AS n_a, b.s AS source_b, b.ns AS n_b
            FROM t a JOIN t b ON a.s < b.s
        ),
        cats AS (SELECT DISTINCT cat FROM c),
        grid AS (SELECT * FROM pairs CROSS JOIN cats),
        j AS (
            SELECT g.source_a, g.source_b, g.n_a, g.n_b, g.cat,
                   COALESCE(ca.n, 0) AS na_c, COALESCE(cb.n, 0) AS nb_c
            FROM grid g
            LEFT JOIN c ca ON ca.s = g.source_a AND ca.cat = g.cat
            LEFT JOIN c cb ON cb.s = g.source_b AND cb.cat = g.cat
        ),
        terms AS (
            SELECT source_a, source_b, n_a, n_b, cat,
                   0.5 * (
                     CASE WHEN na_c > 0 THEN
                       (CAST(na_c AS DOUBLE) / CAST(n_a AS DOUBLE))
                       * round(ln((CAST(na_c AS DOUBLE) / CAST(n_a AS DOUBLE))
                                  / ((CAST(na_c AS DOUBLE) / CAST(n_a AS DOUBLE)
                                      + CAST(nb_c AS DOUBLE)
                                        / CAST(n_b AS DOUBLE))
                                     / 2.0)), 6)
                     ELSE 0.0 END
                     + CASE WHEN nb_c > 0 THEN
                       (CAST(nb_c AS DOUBLE) / CAST(n_b AS DOUBLE))
                       * round(ln((CAST(nb_c AS DOUBLE) / CAST(n_b AS DOUBLE))
                                  / ((CAST(na_c AS DOUBLE) / CAST(n_a AS DOUBLE)
                                      + CAST(nb_c AS DOUBLE)
                                        / CAST(n_b AS DOUBLE))
                                     / 2.0)), 6)
                     ELSE 0.0 END
                   ) AS term
            FROM j
        )
        SELECT source_a, source_b, n_a, n_b,
               SUM(term ORDER BY cat) + 0.0 AS jsd
        FROM terms GROUP BY 1, 2, 3, 4
    """,
)
def source_lang_jsd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import jsd_category_pairs

    (documents,) = load(spark, sf_dir, "documents")
    return jsd_category_pairs(documents, slice_col="source", cat_col="lang")


@register(
    "corpus_novelty_curve",
    op_ids="beyond-reference marginal-novelty / Heaps-law curve: "
    "docs split into 8 equal id-range batches (pure integer-DIV "
    "assignment, exact cross-engine), each scored by the count of "
    "distinct word 5-grams whose FIRST occurrence is that batch — "
    "the diminishing-returns diagnostic before acquiring more of a "
    "source; first-occurrence is a gram-keyed MIN aggregate "
    "(map-side combined, never a row window), the only window is the "
    "cumulative vocabulary sum over <= 8 rows",
    description="per-batch corpus growth: docs, distinct 5-grams, "
    "never-seen-before 5-grams, novelty rate, and cumulative "
    "vocabulary — flat cum_vocab means new data is redundant",
    oracle="""
        WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
        d AS (
            SELECT doc_id, text,
                   CAST(LEAST((doc_id * 8) // (mx + 1), 7) AS INT) AS batch
            FROM documents, mx
        ),
        docs AS (
            SELECT doc_id, batch,
                   list_filter(string_split(text, ' '), x -> x <> '') AS arr
            FROM d
        ),
        grams AS (
            SELECT DISTINCT batch,
                   array_to_string(list_slice(arr, i, i + 4), ' ') AS gram
            FROM docs,
                 LATERAL (SELECT unnest(generate_series(1, len(arr) - 4)) AS i)
        ),
        fb AS (SELECT gram, MIN(batch) AS batch FROM grams GROUP BY 1),
        newg AS (
            SELECT batch, CAST(COUNT(*) AS BIGINT) AS new_grams
            FROM fb GROUP BY 1
        ),
        dist AS (
            SELECT batch, CAST(COUNT(*) AS BIGINT) AS distinct_grams
            FROM grams GROUP BY 1
        ),
        nd AS (
            SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM d GROUP BY 1
        )
        SELECT nd.batch, nd.n_docs,
               COALESCE(dist.distinct_grams, 0) AS distinct_grams,
               COALESCE(newg.new_grams, 0) AS new_grams,
               CASE WHEN COALESCE(dist.distinct_grams, 0) > 0
                    THEN CAST(COALESCE(newg.new_grams, 0) AS DOUBLE)
                         / CAST(dist.distinct_grams AS DOUBLE) END
                   AS novelty_rate,
               CAST(SUM(COALESCE(newg.new_grams, 0)) OVER (
                   ORDER BY nd.batch
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_vocab
        FROM nd
        LEFT JOIN dist USING (batch)
        LEFT JOIN newg USING (batch)
    """,
)
def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.novelty_curve(documents, n=5, n_batches=8)


@register(
    "inverted_index_postings",
    op_ids="beyond-reference inverted index build (term -> df, total "
    "tf, sorted truncated posting list)",
    description="search-index shape: per-term document frequency, "
    "total term frequency, first 20 doc ids as a posting string "
    "(sorted before slicing, so exact)",
    oracle=f"""
        WITH {_TOKS_CTE},
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2)
        SELECT term, COUNT(*) AS df_docs, CAST(SUM(tf) AS BIGINT) AS total_tf,
               array_to_string(list_slice(list_sort(list(doc_id)), 1, 20), ',')
                   AS postings
        FROM tf GROUP BY term
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.inverted_index(documents, max_postings=20)


@register(
    "sequence_token_spans",
    op_ids="beyond-reference concat-then-chunk packing (two-level "
    "distributed prefix sum -> absolute token spans + block ranges)",
    description="GPT-style pretraining layout: docs concatenated in "
    "doc_id order and cut into 512-token blocks; each doc's absolute "
    "span and block range, via bucketed prefix sums (no global-window "
    "single partition)",
    oracle="""
        WITH counts AS (
            SELECT doc_id, source,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS start_offset
            FROM counts
        )
        SELECT doc_id, source, n_tokens,
               CAST(start_offset AS BIGINT) AS start_offset,
               CAST(start_offset // 512 AS BIGINT) AS first_block,
               CAST((start_offset + GREATEST(n_tokens, 1) - 1) // 512 AS BIGINT)
                   AS last_block,
               CAST((start_offset + GREATEST(n_tokens, 1) - 1) // 512
                    - start_offset // 512 + 1 AS BIGINT) AS n_blocks
        FROM cum
    """,
)
def sequence_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators import packing

    (documents,) = load(spark, sf_dir, "documents")
    counts = documents.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "n_tokens"
        ),
    )
    return packing.token_spans(counts, block_size=512, bucket_width=1024)


@register(
    "packed_block_segments",
    op_ids="beyond-reference sequence ASSEMBLY map (concat-then-chunk "
    "materialized: one row per (block, doc) segment, sequences crossing "
    "document boundaries — prefix sum + narrow per-doc block explode)",
    description="which in-doc token range fills which 512-token training "
    "sequence: the join-back map a sequence builder slices docs with; "
    "every non-final block's segments sum to exactly 512 tokens",
    oracle="""
        WITH counts AS (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS start_offset
            FROM counts WHERE n_tokens > 0
        ),
        seg AS (
            SELECT doc_id, start_offset, n_tokens,
                   unnest(generate_series(
                       CAST(start_offset // 512 AS BIGINT),
                       CAST((start_offset + n_tokens - 1) // 512 AS BIGINT)
                   )) AS block_id
            FROM cum
        )
        SELECT block_id, doc_id,
               CAST(GREATEST(0, block_id * 512 - start_offset) AS BIGINT)
                   AS seg_start,
               CAST(LEAST(n_tokens, (block_id + 1) * 512 - start_offset)
                    - GREATEST(0, block_id * 512 - start_offset) AS BIGINT)
                   AS n_seg_tokens
        FROM seg
    """,
)
def packed_block_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators import packing

    (documents,) = load(spark, sf_dir, "documents")
    counts = documents.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "n_tokens"
        ),
    )
    return packing.block_segments(counts, block_size=512, bucket_width=1024)


@register(
    "greedy_pack_bins",
    op_ids="beyond-reference greedy next-fit bin packing (sequential "
    "scan per group via applyInPandas; oracle is a recursive CTE)",
    description="training-sequence packing: within each source, docs "
    "in doc_id order fill 128-token bins next-fit; oversized docs "
    "overflow a bin of their own",
    oracle="""
        WITH RECURSIVE counts AS (
            SELECT source AS group_key, doc_id AS item_id,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS weight
            FROM documents
        ),
        seq AS (
            SELECT group_key, item_id, weight,
                   ROW_NUMBER() OVER (PARTITION BY group_key
                                      ORDER BY item_id) AS rn
            FROM counts
        ),
        pack AS (
            SELECT group_key, item_id, weight, rn,
                   0 AS bin, weight AS fill
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.group_key, s.item_id, s.weight, s.rn,
                   CASE WHEN p.fill + s.weight <= 128
                        THEN p.bin ELSE p.bin + 1 END,
                   CASE WHEN p.fill + s.weight <= 128
                        THEN p.fill + s.weight ELSE s.weight END
            FROM pack p
            JOIN seq s ON s.group_key = p.group_key AND s.rn = p.rn + 1
        )
        SELECT group_key, item_id, weight, bin FROM pack
    """,
)
def greedy_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators import packing

    (documents,) = load(spark, sf_dir, "documents")
    counts = documents.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias(
            "n_tokens"
        ),
    )
    return packing.pack_next_fit(counts, budget=128)


@register(
    "weighted_sample_docs",
    op_ids="beyond-reference weighted reservoir sampling "
    "(Efraimidis-Spirakis u^(1/w) keys from content hashes — "
    "deterministic weighted sample without replacement)",
    description="top-20 documents by hash-derived A-ES key weighted by "
    "n_chars: longer docs win proportionally more often, reproducibly "
    "on any engine/partitioning; plans as TakeOrderedAndProject",
    oracle="""
        WITH h AS (
            SELECT doc_id, n_chars,
                   md5('wsample' || CAST(doc_id AS VARCHAR)) AS hh
            FROM documents
        ),
        v AS (
            SELECT doc_id, n_chars,
                   (instr('0123456789abcdef', substring(hh, 1, 1)) - 1) * 1048576 + (instr('0123456789abcdef', substring(hh, 2, 1)) - 1) * 65536 + (instr('0123456789abcdef', substring(hh, 3, 1)) - 1) * 4096 + (instr('0123456789abcdef', substring(hh, 4, 1)) - 1) * 256 + (instr('0123456789abcdef', substring(hh, 5, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(hh, 6, 1)) - 1) AS vi
            FROM h
        )
        SELECT doc_id, n_chars,
               round(pow(CAST(vi + 1 AS DOUBLE) / CAST(16777216 AS DOUBLE),
                         CAST(1 AS DOUBLE)
                         / GREATEST(CAST(n_chars AS DOUBLE),
                                    CAST(1 AS DOUBLE))), 9) AS sample_key
        FROM v
        ORDER BY sample_key DESC, doc_id
        LIMIT 20
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.sampling import weighted_sample_topk

    (documents,) = load(spark, sf_dir, "documents")
    return weighted_sample_topk(
        documents.select("doc_id", "n_chars"),
        weight_col="n_chars",
        key_cols=["doc_id"],
        k=20,
    )


@register(
    "token_entropy_scores",
    op_ids="beyond-reference quality metric: per-doc Shannon entropy "
    "of the token distribution (repetitiveness filter)",
    description="entropy in nats per document, decimal-summed "
    "12dp-rounded p*ln(p) terms — near-zero = keyword stuffing, "
    "high = diverse text",
    oracle=f"""
        WITH {_TOKS_CTE},
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        totals AS (
            SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                   COUNT(*) AS n_distinct_terms
            FROM tf GROUP BY 1
        )
        SELECT t.doc_id, n_tokens, n_distinct_terms,
               round(-CAST(SUM(CAST(round(
                   (CAST(tf AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                   * ln(CAST(tf AS DOUBLE) / CAST(n_tokens AS DOUBLE)), 12)
                   AS DECIMAL(24,12))) AS DOUBLE), 6) + 0.0
                   AS entropy_nats
        FROM tf t JOIN totals USING (doc_id)
        GROUP BY 1, 2, 3
    """,
)
def token_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.token_entropy(documents)


@register(
    "containment_near_dups",
    op_ids="beyond-reference subset/substring-dup detection: shingle "
    "containment |A∩B| / min(|A|,|B|) (catches size-skewed dups "
    "Jaccard misses)",
    description="pairs where the smaller doc's shingles sit >=90% "
    "inside the larger's — quote-farm / repost-with-boilerplate "
    "signal; same freq-capped shared-shingle join as Jaccard",
    oracle=f"""
        WITH {_SHINGLES_CTE},
        freq_ok AS (SELECT shingle FROM shingles GROUP BY shingle
                    HAVING COUNT(*) <= 50),
        sh AS (SELECT s.* FROM shingles s JOIN freq_ok USING (shingle)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
            FROM sh a JOIN sh b ON a.shingle = b.shingle
                                AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT a_id, b_id,
               n_common / CAST(LEAST(sa.n, sb.n) AS DOUBLE) AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE n_common / CAST(LEAST(sa.n, sb.n) AS DOUBLE) >= 0.9
    """,
)
def containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles(documents, k=SHINGLE_K)
    return dedup.jaccard_pairs(
        sh, threshold=0.9, max_shingle_freq=50, metric="containment"
    )


@register(
    "ann_ivf_topk_nprobe2",
    op_ids="beyond-reference IVF multi-cell probe (nprobe=2: the two "
    "centroid cells nearest the query — IVF's recall knob, the twin "
    "of multi-probe LSH's bit flips)",
    description="top-10 neighbors of vec 0 scored across its two "
    "nearest IVF cells; probed-cell set is a 2-row broadcast so the "
    "candidate scan still prunes by cell",
    oracle=f"""
        WITH {_IVF_ASSIGN_CTE},
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        qscore AS (
            SELECT cell_id,
                   ROUND(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                         / (sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                            * sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))),
                         6) AS qc
            FROM (SELECT c.cell_id, unnest(c.cv) AS x, unnest(q.qe) AS y
                  FROM cents c, q)
            GROUP BY cell_id
        ),
        probed AS (SELECT cell_id FROM qscore
                   ORDER BY qc DESC, cell_id ASC LIMIT 2),
        cand AS (
            SELECT e.* FROM embeddings e
            JOIN assign a ON e.vec_id = a.vec_id
            JOIN probed p ON a.cell_id = p.cell_id
        ),
        dots AS (
            SELECT vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT c.vec_id, unnest(c.embedding) AS x, unnest(q.qe) AS y
                  FROM cand c, q)
            GROUP BY vec_id
        )
        SELECT vec_id, ROUND(dot / (sqrt(na) * sqrt(nq)), 6) + 0.0 AS cosine
        FROM dots ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
)
def ann_ivf_topk_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        embeddings, _query_vec(spark, sf_dir), query_id=0, n_centroids=8,
        k=10, nprobe=2,
    )


@register(
    "embedding_vector_stats",
    op_ids="beyond-reference Arrow-vectorized Pandas UDF path: "
    "per-vector numpy stats (dim, L2 norm, max |component|)",
    description="the pandas_udf template every embedding pipeline "
    "needs (normalize/quantize/codebook): Arrow batch in, numpy math, "
    "Arrow batch out; norms 6dp-rounded per suite convention",
    oracle="""
        SELECT vec_id, len(embedding) AS dim,
               round(sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
                   AS l2_norm,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS max_abs_component
        FROM embeddings
    """,
)
def embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.vector_stats_pandas(embeddings)


@register(
    "pq_codes",
    op_ids="beyond-reference product quantization encode (4 subspaces "
    "x 8 codes; argmin-L2, 6dp-rounded — the memory half of IVFPQ)",
    description="each 64-float embedding compressed to 4 codebook "
    "codes (16 floats per subspace, seed codebooks = first 8 vectors' "
    "subvectors); one row per (vector, subspace) with the chosen code "
    "and its squared distance",
    oracle="""
        WITH subs AS (
            SELECT vec_id, s.subspace,
                   list_slice(embedding, s.subspace * 16 + 1,
                              s.subspace * 16 + 16) AS subvec
            FROM embeddings,
                 LATERAL (SELECT unnest(generate_series(0, 3)) AS subspace) s
        ),
        codes AS (
            SELECT vec_id AS code_id, subspace, subvec AS codevec
            FROM subs WHERE vec_id < 8
        ),
        scored AS (
            SELECT vec_id, subspace, code_id,
                   ROUND(SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                             * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 6)
                       AS dist
            FROM (SELECT v.vec_id, v.subspace, c.code_id,
                         unnest(v.subvec) AS x, unnest(c.codevec) AS y
                  FROM subs v JOIN codes c USING (subspace))
            GROUP BY 1, 2, 3
        )
        SELECT vec_id, subspace, code_id AS code, dist
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY vec_id, subspace
                  ORDER BY dist ASC, code_id ASC) AS rn
              FROM scored)
        WHERE rn = 1
    """,
)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.pq_encode(embeddings, dim=64, m=4, n_codes=8)


@register(
    "ivfpq_topk",
    op_ids="beyond-reference IVFPQ probe: IVF cell pruning + PQ "
    "asymmetric distance (broadcast ADC lookup table, decimal-exact "
    "partial sums)",
    description="top-10 neighbors of vec 0: candidates from its IVF "
    "cell, scored as m=4 code-table lookups per candidate instead of "
    "64-float math — the standard large-scale ANN index, end to end",
    oracle=f"""
        WITH {_IVF_ASSIGN_CTE},
        subs AS (
            SELECT vec_id, s.subspace,
                   list_slice(embedding, s.subspace * 16 + 1,
                              s.subspace * 16 + 16) AS subvec
            FROM embeddings,
                 LATERAL (SELECT unnest(generate_series(0, 3)) AS subspace) s
        ),
        cbook AS (
            SELECT vec_id AS code_id, subspace, subvec AS codevec
            FROM subs WHERE vec_id < 8
        ),
        pqscored AS (
            SELECT vec_id, subspace, code_id,
                   ROUND(SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                             * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 6)
                       AS dist
            FROM (SELECT v.vec_id, v.subspace, c.code_id,
                         unnest(v.subvec) AS x, unnest(c.codevec) AS y
                  FROM subs v JOIN cbook c USING (subspace))
            GROUP BY 1, 2, 3
        ),
        pqcodes AS (
            SELECT vec_id, subspace, code_id AS code
            FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY vec_id, subspace
                      ORDER BY dist ASC, code_id ASC) AS rn
                  FROM pqscored)
            WHERE rn = 1
        ),
        qdist AS (
            SELECT c.subspace, c.code_id AS code,
                   CAST(ROUND(SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                  * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
                              6) AS DECIMAL(18,6)) AS qd
            FROM (SELECT c.subspace, c.code_id,
                         unnest(q.subvec) AS x, unnest(c.codevec) AS y
                  FROM (SELECT * FROM subs WHERE vec_id = 0) q
                  JOIN cbook c USING (subspace)) AS c(subspace, code_id, x, y)
            GROUP BY 1, 2
        ),
        cand AS (
            SELECT a.vec_id FROM assign a
            JOIN (SELECT cell_id FROM assign WHERE vec_id = 0) qc
              ON a.cell_id = qc.cell_id
        )
        SELECT p.vec_id, CAST(SUM(qd) AS DOUBLE) AS adc_dist
        FROM pqcodes p
        JOIN cand USING (vec_id)
        JOIN qdist d ON d.subspace = p.subspace AND d.code = p.code
        GROUP BY 1
        ORDER BY adc_dist ASC, vec_id ASC
        LIMIT 10
    """,
)
def ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.ivfpq_topk(
        embeddings, query_id=0, n_centroids=8, dim=64, m=4, n_codes=8, k=10
    )


_DOCS_ARR_CTE = """
    docs AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS arr
        FROM documents
    )
"""

_BM25_TERMS = ("spark", "join", "window", "sketch")


@register(
    "bm25_doc_ranking",
    op_ids="beyond-reference BM25 retrieval scoring (RSJ idf, "
    "length-normalized tf; the ranking half of the inverted-index "
    "search stack)",
    description="top-20 docs for a fixed 4-term query; idf 6dp-decimal, "
    "per-term contributions 12dp-decimal-summed (order-free), score "
    "6dp; tokens filtered to query terms before any shuffle",
    oracle=f"""
        WITH {_DOCS_ARR_CTE},
        dl AS (SELECT doc_id, len(arr) AS dl FROM docs),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(len(arr)) AS sum_dl FROM docs),
        toks AS (SELECT doc_id, unnest(arr) AS term FROM docs),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks
            WHERE term IN {str(_BM25_TERMS)}
            GROUP BY 1, 2
        ),
        idf AS (
            SELECT term,
                   CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_docs AS DOUBLE) + 0.5)
                                        / (CAST(df_docs AS DOUBLE) + 0.5)), 6)
                        AS DECIMAL(12,6)) AS idf
            FROM (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY 1), stats
        ),
        contrib AS (
            SELECT tf.doc_id, dl.dl,
                   CAST(round((CAST(idf AS DOUBLE) * (CAST(tf AS DOUBLE) * 2.2))
                              / (CAST(tf AS DOUBLE)
                                 + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE))
                                                 / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))),
                              12) AS DECIMAL(24,12)) AS c
            FROM tf JOIN idf USING (term) JOIN dl ON dl.doc_id = tf.doc_id, stats
        )
        SELECT doc_id, dl, COUNT(*) AS n_hit_terms,
               round(CAST(SUM(c) AS DOUBLE), 6) AS bm25
        FROM contrib
        GROUP BY 1, 2
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT 20
    """,
)
def bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.bm25_scores(documents, list(_BM25_TERMS), k=20)


@register(
    "hybrid_rank_fusion",
    op_ids="beyond-reference hybrid-retrieval Reciprocal Rank Fusion "
    "(Cormack RRF, the default lexical+vector combiner — needs no "
    "score calibration, ranks only): BM25 top-50 fused with a "
    "length-normalized TF top-50 arm via 1/(60+rank) + 1/(60+rank); "
    "arms arrive as bounded top-N relations so the rank windows, "
    "full-outer join and final TakeOrdered all run over <= 2N rows — "
    "nothing corpus-scale inside the fusion",
    description="top-20 fused (RRF k=60) documents for the fixed "
    "4-term query from the BM25 arm and the TF/length arm, with both "
    "arm ranks (NULL where an arm missed)",
    oracle=f"""
        WITH {_DOCS_ARR_CTE},
        dl AS (SELECT doc_id, len(arr) AS dl FROM docs),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(len(arr)) AS sum_dl
                  FROM docs),
        toks AS (SELECT doc_id, unnest(arr) AS term FROM docs),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks
            WHERE term IN {str(_BM25_TERMS)}
            GROUP BY 1, 2
        ),
        idf AS (
            SELECT term,
                   CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE)
                                        - CAST(df_docs AS DOUBLE) + 0.5)
                                        / (CAST(df_docs AS DOUBLE) + 0.5)), 6)
                        AS DECIMAL(12,6)) AS idf
            FROM (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY 1), stats
        ),
        contrib AS (
            SELECT tf.doc_id,
                   CAST(round((CAST(idf AS DOUBLE) * (CAST(tf AS DOUBLE) * 2.2))
                              / (CAST(tf AS DOUBLE)
                                 + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE))
                                                 / (CAST(sum_dl AS DOUBLE)
                                                    / CAST(n_docs AS DOUBLE)))),
                              12) AS DECIMAL(24,12)) AS c
            FROM tf JOIN idf USING (term)
            JOIN dl ON dl.doc_id = tf.doc_id, stats
        ),
        arm_a AS (
            SELECT doc_id, round(CAST(SUM(c) AS DOUBLE), 6) AS bm25
            FROM contrib GROUP BY 1
            ORDER BY bm25 DESC, doc_id ASC LIMIT 50
        ),
        tfarm AS (
            SELECT doc_id, len(arr) AS dl,
                   len(list_filter(arr,
                       x -> list_contains(
                           ['spark', 'join', 'window', 'sketch'], x)))
                       AS tf_hits
            FROM docs
        ),
        arm_b AS (
            SELECT doc_id,
                   round(CAST(tf_hits AS DOUBLE) / CAST(dl AS DOUBLE), 6)
                       + 0.0 AS tf_norm
            FROM tfarm WHERE dl > 0 AND tf_hits > 0
            ORDER BY tf_norm DESC, doc_id ASC LIMIT 50
        ),
        ra AS (SELECT doc_id,
                      CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC)
                           AS INT) AS rank_a
               FROM arm_a),
        rb AS (SELECT doc_id,
                      CAST(ROW_NUMBER() OVER (ORDER BY tf_norm DESC,
                                              doc_id ASC) AS INT) AS rank_b
               FROM arm_b),
        f AS (
            SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id, rank_a, rank_b,
                   (CASE WHEN rank_a IS NULL THEN 0.0
                         ELSE 1.0 / CAST(60 + rank_a AS DOUBLE) END
                    + CASE WHEN rank_b IS NULL THEN 0.0
                           ELSE 1.0 / CAST(60 + rank_b AS DOUBLE) END)
                       AS rrf_score
            FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
        )
        SELECT doc_id, rank_a, rank_b, rrf_score
        FROM f ORDER BY rrf_score DESC, doc_id ASC LIMIT 20
    """,
)
def hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.ranking import rrf_fuse

    (documents,) = load(spark, sf_dir, "documents")
    arm_a = text.bm25_scores(documents, list(_BM25_TERMS), k=50)
    arm_b = text.tf_norm_scores(documents, list(_BM25_TERMS), k=50)
    return rrf_fuse(
        arm_a, "bm25", arm_b, "tf_norm", id_col="doc_id",
        k_rrf=60, top_n=20,
    )


@register(
    "pmi_collocations",
    op_ids="beyond-reference PMI collocation mining (corpus-wide "
    "bigram vs unigram pointwise mutual information — tokenizer "
    "merge-candidate / phrase extraction)",
    description="top-30 bigrams with count >= 5 by PMI (6dp, "
    "(w1,w2) tiebreak); min-count filter shrinks the bigram relation "
    "before the unigram joins; totals ride a 1-row broadcast",
    oracle=f"""
        WITH {_DOCS_ARR_CTE},
        uni AS (SELECT unnest(arr) AS w FROM docs),
        bi AS (
            SELECT array_to_string(list_slice(arr, i, i + 1), ' ') AS gram
            FROM docs, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i)
        ),
        c_uni AS (SELECT w, COUNT(*) AS c_w FROM uni GROUP BY 1),
        totals AS (
            SELECT (SELECT COUNT(*) FROM uni) AS t_uni,
                   (SELECT COUNT(*) FROM bi) AS t_bi
        ),
        c_bi AS (
            SELECT string_split(gram, ' ')[1] AS w1,
                   string_split(gram, ' ')[2] AS w2,
                   COUNT(*) AS c_ab
            FROM bi GROUP BY 1, 2 HAVING COUNT(*) >= 5
        )
        SELECT w1, w2, c_ab, a.c_w AS c_w1, b.c_w AS c_w2,
               round(ln((CAST(c_ab AS DOUBLE) / CAST(t_bi AS DOUBLE))
                        / ((CAST(a.c_w AS DOUBLE) / CAST(t_uni AS DOUBLE))
                           * (CAST(b.c_w AS DOUBLE) / CAST(t_uni AS DOUBLE)))), 6)
                   + 0.0 AS pmi
        FROM c_bi
        JOIN c_uni a ON a.w = w1
        JOIN c_uni b ON b.w = w2
        CROSS JOIN totals
        ORDER BY pmi DESC, w1 ASC, w2 ASC
        LIMIT 30
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.pmi_bigrams(documents, min_count=5, k=30)


@register(
    "repetition_signals",
    op_ids="beyond-reference Gopher-style repetition filters "
    "(duplicate word-5-gram fraction + most-frequent-bigram share "
    "per document)",
    description="within-doc repetition metrics for boilerplate/"
    "keyword-stuffing removal; exact integer counts, fractions are "
    "single double divisions; (doc,gram) map-side-combined aggs only",
    oracle=f"""
        WITH {_DOCS_ARR_CTE},
        g5 AS (
            SELECT doc_id, array_to_string(list_slice(arr, i, i + 4), ' ') AS gram
            FROM docs, LATERAL (SELECT unnest(generate_series(1, len(arr) - 4)) AS i)
        ),
        ng AS (
            SELECT doc_id, SUM(c) AS n_grams, COUNT(*) AS n_distinct_grams
            FROM (SELECT doc_id, gram, COUNT(*) AS c FROM g5 GROUP BY 1, 2)
            GROUP BY 1
        ),
        bg AS (
            SELECT doc_id, array_to_string(list_slice(arr, i, i + 1), ' ') AS gram
            FROM docs, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i)
        ),
        nb AS (
            SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram_count
            FROM (SELECT doc_id, gram, COUNT(*) AS c FROM bg GROUP BY 1, 2)
            GROUP BY 1
        )
        SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, n_distinct_grams,
               CAST(n_grams - n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
                   AS dup_ngram_frac,
               CAST(n_bigrams AS BIGINT) AS n_bigrams, top_bigram_count,
               CAST(top_bigram_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                   AS top_bigram_frac
        FROM ng JOIN nb USING (doc_id)
    """,
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.repetition_signals(documents, n=5)


@register(
    "media_resize_meta",
    op_ids="beyond-reference multimodal resize plumbing (mapInPandas "
    "media->media transform; mime retag + recomputed n_bytes)",
    description="documents-as-media resized through resize_media: text "
    "payloads are not decodable images, so the deterministic "
    "truncation branch runs whether or not Pillow is installed — the "
    "Spark contract (schema, Arrow batching, metadata recompute) is "
    "what this verifies",
    oracle="""
        SELECT doc_id AS media_id,
               CASE WHEN text IS NULL THEN NULL
                    ELSE 'text/plain;resized' END AS mime,
               CAST(CASE WHEN text IS NULL OR octet_length(encode(text)) = 0
                         THEN 0
                         ELSE GREATEST(octet_length(encode(text)) // 2, 1)
                    END AS BIGINT) AS n_bytes,
               source
        FROM documents
    """,
)
def media_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators import multimodal

    (documents,) = load(spark, sf_dir, "documents")
    media = multimodal.as_media_table(documents)
    resized = multimodal.resize_media(media, max_dim=128)
    return resized.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.source").alias("source"),
    )


@register(
    "sample_temperature_mix",
    op_ids="beyond-reference temperature-scaled corpus mix (mT5/XLM-R "
    "alpha-sampling: share_g = n_g^alpha / sum n^alpha, solved "
    "in-engine, deterministic hash filter)",
    description="alpha=0.3 language mix: low-resource languages boosted "
    "toward (not all the way to) uniform, bottleneck language kept "
    "whole; pow rounded 6dp per the suite's libm convention",
    oracle="""
        WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        sh AS (
            SELECT lang, n,
                   round(pow(CAST(n AS DOUBLE), 0.3), 6)
                     / SUM(round(pow(CAST(n AS DOUBLE), 0.3), 6)) OVER ()
                       AS share
            FROM counts
        ),
        rates AS (
            SELECT lang, round((MIN(n / share) OVER ()) * share / n, 9) AS rate
            FROM sh
        )
        SELECT d.doc_id, d.lang
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE r.rate >= 1.0
           OR substring(md5('tmix-v1|' || CAST(d.doc_id AS VARCHAR)), 1, 8)
              < lpad(lower(to_hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))), 8, '0')
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.sampling import temperature_rebalance

    (documents,) = load(spark, sf_dir, "documents")
    return temperature_rebalance(
        documents.select("doc_id", "lang"),
        group_col="lang",
        alpha=0.3,
        id_cols=["doc_id"],
        salt="tmix-v1",
    )


@register(
    "doc_chunking_overlap",
    op_ids="beyond-reference RAG/long-context chunking: overlapping "
    "token windows per document (pure array expressions, narrow 1->N "
    "explode, no shuffle)",
    description="documents cut into 64-token chunks with 16-token "
    "overlap: stable (doc, chunk_index) keys, absolute start offsets, "
    "a kept short tail, and the chunk text — the retrieval-indexing "
    "preprocessing shape",
    oracle="""
        WITH docs AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS arr
            FROM documents
        ),
        sized AS (
            SELECT doc_id, arr, len(arr) AS n,
                   CASE WHEN len(arr) = 0 THEN 0
                        WHEN len(arr) <= 64 THEN 1
                        ELSE CAST(ceil((len(arr) - 16) / 48.0) AS INT)
                   END AS n_chunks
            FROM docs
        )
        SELECT doc_id,
               CAST(i AS INT) AS chunk_index,
               CAST(i * 48 AS BIGINT) AS start_token,
               CAST(LEAST(n - i * 48, 64) AS BIGINT) AS n_chunk_tokens,
               array_to_string(list_slice(arr, i * 48 + 1, i * 48 + 64), ' ')
                   AS chunk_text
        FROM sized,
             LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i)
        WHERE n_chunks > 0
    """,
)
def doc_chunking_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.packing import chunk_documents

    (documents,) = load(spark, sf_dir, "documents")
    return chunk_documents(documents, chunk_size=64, overlap=16)


@register(
    "embedding_int8_quantize",
    op_ids="beyond-reference embedding quantization: per-vector affine "
    "int8 codes + dequant params (float32 -> int8, one codegen pass, "
    "no shuffle, no Python)",
    description="each embedding reduced to 64 int8 codes with "
    "per-vector (min, max) dequantization params — the 4x "
    "memory/bandwidth layer of a serving/coarse-scoring stack",
    oracle="""
        WITH r AS (
            SELECT vec_id, embedding,
                   CAST(list_aggregate(list_transform(embedding,
                            x -> CAST(x AS DOUBLE)), 'min') AS DOUBLE) AS vmin,
                   CAST(list_aggregate(list_transform(embedding,
                            x -> CAST(x AS DOUBLE)), 'max') AS DOUBLE) AS vmax
            FROM embeddings
        )
        SELECT vec_id, vmin, vmax, len(embedding) AS dim,
               array_to_string(list_transform(embedding, x ->
                   CAST(CASE WHEN vmax = vmin THEN 0
                        ELSE LEAST(GREATEST(
                            CAST(floor(((CAST(x AS DOUBLE) - vmin) * 255.0)
                                       / (vmax - vmin)) AS BIGINT) - 128,
                            -128), 127)
                   END AS VARCHAR)), ',') AS q_codes
        FROM r
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.quantize_embeddings_int8(embeddings)


@register(
    "bpe_merge_candidates",
    op_ids="beyond-reference tokenizer training primitive: BPE merge-pair "
    "counting (adjacent symbol-pair frequencies within words, the inner "
    "loop of Sennrich-style BPE training)",
    description="top-50 adjacent character pairs by corpus frequency "
    "(count >= 2, pairs never cross word boundaries; count desc / pair "
    "asc total order) — one counting pass of a BPE training loop",
    oracle="""
        WITH words AS (
            SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                AS w
            FROM documents
        ),
        pairs AS (
            SELECT substring(w, i, 1) || ' ' || substring(w, i + 1, 1) AS pair
            FROM words,
                 LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i)
            WHERE length(w) >= 2
        )
        SELECT pair, COUNT(*) AS pair_count
        FROM pairs GROUP BY pair
        HAVING COUNT(*) >= 2
        ORDER BY pair_count DESC, pair ASC
        LIMIT 50
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.bpe_merge_candidates(documents, k=50, min_count=2)


@register(
    "vocab_typo_pairs",
    op_ids="beyond-reference fuzzy matching: blocked edit-distance "
    "pairs (record-linkage blocking — prefix block + length band, "
    "exact Levenshtein only on co-blocked candidates)",
    description="categorical-value near-collisions across the brand and "
    "source vocabularies (Brand#1 ~ Brand#13, src1 ~ src13): pairs "
    "within 1 edit sharing a first character — the typo-clustering / "
    "entity-resolution primitive, never all-pairs (block fan-out "
    "bounds the join like LSH band width does)",
    oracle="""
        WITH vocab AS (
            SELECT DISTINCT p_brand AS term FROM part
            UNION
            SELECT DISTINCT source FROM documents
        )
        SELECT a.term AS a, b.term AS b,
               levenshtein(a.term, b.term) AS dist
        FROM vocab a JOIN vocab b
          ON substring(a.term, 1, 1) = substring(b.term, 1, 1)
         AND a.term < b.term
         AND abs(length(a.term) - length(b.term)) <= 1
        WHERE levenshtein(a.term, b.term) <= 1
    """,
)
def vocab_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.fuzzyjoin import (
        blocked_edit_distance_pairs,
    )

    part, documents = load(spark, sf_dir, "part", "documents")
    vocab = part.select(F.col("p_brand").alias("term")).unionByName(
        documents.select(F.col("source").alias("term"))
    )
    return blocked_edit_distance_pairs(
        vocab, "term", max_dist=1, prefix_len=1, length_band=1
    )


_FUZZY_REF = ("src1", "src33", "srx4", "zzz9")


@register(
    "fuzzy_source_lookup",
    op_ids="beyond-reference fuzzy semi-join lookup (blocked edit-distance "
    "EXISTS — 'is this near-miss of a reference string in the corpus')",
    description="documents whose source is within 1 edit of a fixed "
    "reference list (same prefix block + length band): src1 matches "
    "src1/src11/..., srx4 reaches src4 across a mid-string typo, zzz9 "
    "matches nothing — the decontamination/entity-lookup shape",
    oracle=f"""
        SELECT doc_id, source FROM documents d
        WHERE EXISTS (
            SELECT 1 FROM (VALUES {", ".join(f"('{v}')" for v in _FUZZY_REF)})
                AS ref(name)
            WHERE substring(d.source, 1, 1) = substring(ref.name, 1, 1)
              AND abs(length(d.source) - length(ref.name)) <= 1
              AND levenshtein(d.source, ref.name) <= 1
        )
    """,
)
def fuzzy_source_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.fuzzyjoin import fuzzy_semi_match

    (documents,) = load(spark, sf_dir, "documents")
    ref = spark.createDataFrame([(v,) for v in _FUZZY_REF], "name string")
    return fuzzy_semi_match(
        documents.select("doc_id", "source"), ref, "source", "name", max_dist=1
    )


@register(
    "kmeans_lloyd_step",
    op_ids="beyond-reference iterative clustering primitive (one Lloyd step: "
    "broadcast assign + decimal-exact centroid recompute)",
    description="assign vectors to nearest of 8 seed centroids (sq-L2, 6dp, "
    "ties to lower cell) and recompute per-dim centroid means — the loop "
    "body of k-means / IVF training / semantic dedup",
    oracle="""
        WITH cents AS (SELECT vec_id AS cell_id, embedding AS cv FROM embeddings
                       WHERE vec_id < 8),
        dists AS (
            SELECT vec_id, cell_id,
                   ROUND(SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                             * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 6) AS d
            FROM (SELECT e.vec_id, c.cell_id, unnest(e.embedding) AS x,
                         unnest(c.cv) AS y
                  FROM embeddings e, cents c)
            GROUP BY vec_id, cell_id
        ),
        assign AS (
            SELECT vec_id, cell_id FROM (
                SELECT vec_id, cell_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d ASC, cell_id ASC) AS rn
                FROM dists) WHERE rn = 1
        ),
        members AS (
            SELECT a.cell_id,
                   generate_subscripts(e.embedding, 1) - 1 AS dim,
                   unnest(e.embedding) AS x
            FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
        )
        SELECT cell_id, dim, COUNT(*) AS n_members,
               ROUND(CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE), 12)
                                   AS DECIMAL(20,12))) AS DOUBLE)
                     / COUNT(*), 6) + 0.0 AS centroid_val
        FROM members GROUP BY cell_id, dim
    """,
)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.kmeans_lloyd_step(embeddings, n_centroids=8)


@register(
    "corpus_shuffle_order",
    op_ids="beyond-reference deterministic corpus shuffle (content-"
    "addressed global training order via the scale-safe two-level "
    "rank — no RNG, no global sort)",
    description="every document ranked by md5('shuf-v1|'||doc_id): the "
    "reproducible pseudo-random training order a corpus pipeline "
    "feeds the dataloader, stable under reruns and repartitioning",
    oracle="""
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY md5('shuf-v1|' || CAST(doc_id AS VARCHAR)),
                            doc_id
               ) AS shuffle_pos
        FROM documents
    """,
)
def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.sampling import deterministic_shuffle

    (documents,) = load(spark, sf_dir, "documents")
    return deterministic_shuffle(
        documents.select("doc_id"), key_cols=["doc_id"], salt="shuf-v1"
    ).select("doc_id", "shuffle_pos")


@register(
    "cdc_chunk_dedup",
    op_ids="beyond-reference content-defined chunking dedup "
    "(FastCDC-style rolling-window boundaries: hex4(md5(8-char "
    "window)) % 16 == 0 triggers a cut, so an early insertion "
    "re-chunks only the region it touches — the shift-resistant twin "
    "of dup_chunk_fraction's fixed token grain); position explode + "
    "boundary filter stay map-side codegen, only narrow (_id, e) "
    "boundary rows shuffle into a per-doc array, text crosses ONE "
    "doc-grain equi-join — never the boundary grain",
    description="per-document content-defined chunk dedup scorecard: "
    "chunk count, chunks whose hash appears in another document, "
    "duplicated fraction — sub-document dedup that survives "
    "insertions/deletions",
    oracle=f"""
        WITH cpos AS (
            SELECT doc_id, text,
                   unnest(range(1, length(text) - 6)) AS i
            FROM documents WHERE length(text) >= 8
        ),
        cbnd AS (
            SELECT doc_id, text, i + 7 AS e
            FROM cpos
            WHERE ({_hex_int_sql("md5(substring(text, i, 8))", 4)}) % 16 = 0
              AND i + 7 < length(text)
        ),
        cspans AS (
            SELECT doc_id, text,
                   COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0)
                       + 1 AS s,
                   e
            FROM cbnd
        ),
        ctail AS (
            SELECT d.doc_id, d.text,
                   COALESCE(b.last_e, 0) + 1 AS s,
                   length(d.text) AS e
            FROM documents d
            LEFT JOIN (SELECT doc_id, MAX(e) AS last_e FROM cbnd
                       GROUP BY 1) b USING (doc_id)
            WHERE length(d.text) >= 1
        ),
        cchunks AS (
            SELECT doc_id, md5(substring(text, s, e - s + 1)) AS h
            FROM (SELECT * FROM cspans UNION ALL SELECT * FROM ctail)
        ),
        chash AS (
            SELECT h, COUNT(DISTINCT doc_id) AS nd FROM cchunks GROUP BY 1
        ),
        cdoc AS (
            SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_chunks
            FROM cchunks c JOIN chash USING (h) GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(n_chunks, 0) AS n_chunks,
               COALESCE(n_dup_chunks, 0) AS n_dup_chunks,
               CASE WHEN COALESCE(n_chunks, 0) = 0 THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(n_dup_chunks AS DOUBLE)
                         / CAST(n_chunks AS DOUBLE)
               END AS dup_chunk_frac
        FROM documents d LEFT JOIN cdoc USING (doc_id)
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.cdc_dedup_stats(
        documents, id_col="doc_id", text_col="text", window=8, divisor=16
    )


@register(
    "neyman_allocation_by_lang",
    op_ids="beyond-reference variance-optimal sampling design (Neyman "
    "allocation: budget split proportional to N_h * sigma_h — the "
    "stratified-mean-variance minimizer; complements the "
    "proportional rebalance and temperature-mix allocators which see "
    "counts only); exact integer stratum moments, integer-guarded "
    "sigma (n*ssd > s*s in DECIMAL(38,0) decides positivity; "
    "degenerate strata emit sigma 0), cross-stratum total folded in "
    "stratum order (the DCG recipe)",
    description="per-language Neyman allocation of a 100k-doc "
    "sampling budget over doc-length variability: stratum size, "
    "sigma, optimal fraction and floor'd allocation",
    oracle="""
        WITH nv AS (
            SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
            FROM documents WHERE n_chars IS NOT NULL
        ),
        np AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(v) AS BIGINT) AS s,
                   SUM(CAST(v AS HUGEINT) * v) AS ssd
            FROM nv GROUP BY 1
        ),
        ns AS (
            SELECT g, n,
                   CASE WHEN CAST(n AS HUGEINT) * ssd
                             > CAST(s AS HUGEINT) * s
                        THEN sqrt(CAST(ssd AS DOUBLE) / CAST(n AS DOUBLE)
                                  - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                        ELSE 0.0 END AS sigma
            FROM np
        ),
        nw AS (
            SELECT g, n, sigma, CAST(n AS DOUBLE) * sigma AS w FROM ns
        ),
        nt AS (SELECT SUM(w ORDER BY g) AS tot_w FROM nw)
        SELECT g AS lang, n AS n_docs, sigma,
               CASE WHEN tot_w = 0.0 THEN CAST(NULL AS DOUBLE)
                    ELSE w / tot_w END AS alloc_frac,
               CASE WHEN tot_w = 0.0 THEN CAST(NULL AS BIGINT)
                    ELSE CAST(floor(100000.0 * w / tot_w) AS BIGINT)
               END AS n_alloc
        FROM nw CROSS JOIN nt
    """,
)
def neyman_allocation_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.sampling import neyman_allocation

    (documents,) = load(spark, sf_dir, "documents")
    return neyman_allocation(
        documents, stratum_col="lang", size_col="n_chars", budget=100_000
    )


@register(
    "dup_chunk_fraction",
    op_ids="beyond-reference sub-document dedup signal (Dolma/RedPajama "
    "duplicated-chunk fraction: narrow transform/slice chunking, "
    "md5-narrowed shuffle, two keyed partial aggs — never all-pairs, "
    "never text on the wire)",
    description="per-document fraction of 8-token chunks whose exact "
    "text occurs in >= 2 distinct documents — the sub-document "
    "duplication signal curation pipelines threshold on",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents
        ),
        chunks AS (
            SELECT doc_id,
                   md5(array_to_string(ts[(i*8+1):(i*8+8)], ' ')) AS chunk_hash
            FROM (SELECT doc_id, ts,
                         CAST(unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT)))
                              AS BIGINT) AS i
                  FROM base WHERE len(ts) > 0)
        ),
        occ AS (
            SELECT chunk_hash, COUNT(DISTINCT doc_id) AS nd
            FROM chunks GROUP BY chunk_hash
        )
        SELECT c.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN o.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_chunks,
               ROUND(SUM(CASE WHEN o.nd >= 2 THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 6) + 0.0 AS dup_chunk_frac
        FROM chunks c JOIN occ o USING (chunk_hash)
        GROUP BY c.doc_id
    """,
)
def dup_chunk_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.dup_chunk_stats(documents, chunk_tokens=8)


@register(
    "oov_rate_scores",
    op_ids="beyond-reference tokenizer-coverage signal (corpus top-k "
    "vocabulary via distributed TakeOrdered, broadcast back; one "
    "keyed per-doc agg)",
    description="per-document out-of-vocabulary rate against the "
    "corpus's own top-64 token vocabulary (lexicographic "
    "tie-break), the fixed-vocab coverage signal for spotting "
    "noise/wrong-language docs",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                              t -> t <> '')) AS term
            FROM documents
        ),
        counts AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY term),
        vocab AS (SELECT term FROM counts
                  ORDER BY n DESC, term ASC LIMIT 64)
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov,
               ROUND(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 6) + 0.0 AS oov_rate
        FROM toks t LEFT JOIN vocab v USING (term)
        GROUP BY t.doc_id
    """,
)
def oov_rate_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.oov_rate(documents, vocab_size=64)


@register(
    "embedding_gram_matrix",
    op_ids="beyond-reference distributed linear algebra (X^T X in one "
    "pass: fixed-point exact integer accumulation, O(d^2) shuffle "
    "keys independent of row count — the PCA/whitening sufficient "
    "statistic)",
    description="upper-triangular Gram matrix of the embedding table "
    "on 1e6-fixed-point components: 2080 exact cells from one "
    "narrow pass + one tiny keyed agg",
    oracle="""
        WITH cells AS (
            SELECT CAST(r1.i AS BIGINT) AS i, CAST(r2.j AS BIGINT) AS j,
                   CAST(ROUND(CAST(e.embedding[CAST(r1.i + 1 AS INT)] AS DOUBLE)
                              * 1000000, 0) AS BIGINT)
                   * CAST(ROUND(CAST(e.embedding[CAST(r2.j + 1 AS INT)] AS DOUBLE)
                                * 1000000, 0) AS BIGINT) AS p
            FROM embeddings e, range(0, 64) r1(i), range(0, 64) r2(j)
            WHERE r2.j >= r1.i
        )
        SELECT i, j,
               ROUND(CAST(SUM(p) AS DOUBLE) / 1000000000000.0, 6) + 0.0 AS gram
        FROM cells GROUP BY i, j
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.gram_matrix(embeddings)


@register(
    "ann_recall_eval",
    op_ids="beyond-reference ANN index evaluation (recall@k of the "
    "LSH single-bucket probe vs the exact scan, over a deterministic "
    "query sample: broadcast-only ground-truth arm, production probe "
    "path for the approx arm)",
    description="recall@10 per sampled query (vec_id % 25 == 0) of "
    "bucket-pruned ANN against exact cosine top-10 — the index "
    "quality gate before trusting LSH at corpus scale",
    oracle=f"""
        WITH {_planes_sql_values()},
        qs AS (SELECT vec_id AS qid, embedding AS qe
               FROM embeddings WHERE vec_id % 25 = 0),
        exact_dots AS (
            SELECT qid, vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT q.qid, e.vec_id,
                         unnest(e.embedding) AS x, unnest(q.qe) AS y
                  FROM embeddings e, qs q WHERE e.vec_id <> q.qid)
            GROUP BY qid, vec_id
        ),
        exact_top AS (
            SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid
                           ORDER BY ROUND(dot / (sqrt(na) * sqrt(nq)), 6) DESC,
                                    vec_id ASC) AS rn
                FROM exact_dots) WHERE rn <= 10
        ),
        comps AS (
            SELECT vec_id, p, SUM(CAST(x AS DOUBLE) * CAST(sv AS DOUBLE)) AS dot
            FROM (SELECT e.vec_id, pl.p, unnest(e.embedding) AS x,
                         unnest(pl.s) AS sv
                  FROM embeddings e, planes pl)
            GROUP BY vec_id, p
        ),
        buckets AS (
            SELECT vec_id,
                   SUM(CASE WHEN dot > 0 THEN 1::BIGINT << p ELSE 0 END) AS bucket
            FROM comps GROUP BY vec_id
        ),
        qb AS (SELECT qs.qid, b.bucket FROM buckets b
               JOIN qs ON b.vec_id = qs.qid),
        cand AS (SELECT qb.qid, b.vec_id FROM qb
                 JOIN buckets b ON b.bucket = qb.bucket AND b.vec_id <> qb.qid),
        appr_dots AS (
            SELECT qid, vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT c.qid, e.vec_id,
                         unnest(e.embedding) AS x, unnest(q.qe) AS y
                  FROM cand c
                  JOIN embeddings e ON e.vec_id = c.vec_id
                  JOIN qs q ON q.qid = c.qid)
            GROUP BY qid, vec_id
        ),
        appr_top AS (
            SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid
                           ORDER BY ROUND(dot / (sqrt(na) * sqrt(nq)), 6) DESC,
                                    vec_id ASC) AS rn
                FROM appr_dots) WHERE rn <= 10
        )
        SELECT et.qid AS query_id,
               CAST(COUNT(*) AS BIGINT) AS n_exact,
               CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               ROUND(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 6) + 0.0 AS recall_at_k
        FROM exact_top et
        LEFT JOIN appr_top ap ON ap.qid = et.qid AND ap.vec_id = et.vec_id
        GROUP BY et.qid
    """,
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.ann_recall_at_k(
        embeddings, n_planes=8, dim=64, k=10, sample_mod=25
    )


@register(
    "bigram_logprob_scores",
    op_ids="beyond-reference bigram-LM fluency scoring (add-one "
    "smoothed P(w2|w1) trained on the corpus; left-context counts "
    "derived from the bigram relation, V on a 1-row broadcast)",
    description="per-doc average negative log-prob under the corpus's "
    "own smoothed bigram LM — flags common-words-in-uncommon-order "
    "docs the unigram filter passes",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents
        ),
        bi AS (
            SELECT doc_id,
                   ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] AS gram
            FROM (SELECT doc_id, ts,
                         CAST(unnest(range(1, len(ts))) AS BIGINT) AS i
                  FROM toks WHERE len(ts) >= 2)
        ),
        cb AS (SELECT gram, COUNT(*) AS c_ab FROM bi GROUP BY gram),
        cl AS (SELECT string_split(gram, ' ')[1] AS w1, SUM(c_ab) AS c_w1
               FROM cb GROUP BY 1),
        vs AS (SELECT COUNT(DISTINCT t) AS v
               FROM (SELECT unnest(ts) AS t FROM toks)),
        lp AS (
            SELECT cb.gram,
                   CAST(ROUND(ln(CAST(cb.c_ab + 1 AS DOUBLE)
                                 / CAST(cl.c_w1 + vs.v AS DOUBLE)), 6)
                        AS DECIMAL(12,6)) AS logp
            FROM cb JOIN cl ON string_split(cb.gram, ' ')[1] = cl.w1, vs
        )
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               -(CAST(SUM(lp.logp) AS DOUBLE)) / COUNT(*) AS avg_neg_logprob2
        FROM bi b JOIN lp ON lp.gram = b.gram
        GROUP BY b.doc_id
    """,
)
def bigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.bigram_logprob_score(documents)


@register(
    "minhash_jaccard_error",
    op_ids="beyond-reference sketch-quality evaluation (MinHash "
    "signature-agreement estimate vs exact shingle Jaccard on the "
    "LSH candidate pairs — the estimator-error gate before trusting "
    "the sketch at corpus scale; zero-overlap false-positive "
    "candidates kept via left join)",
    description="per LSH candidate pair: estimated Jaccard "
    "(matching minhash slots / 8) vs exact shingle Jaccard and the "
    "absolute error — all raw deterministic doubles",
    oracle=f"""
        WITH {_SHINGLES_CTE}, {_SIG_CTE},
        bands AS (
            {" UNION ALL ".join(
                f"SELECT doc_id, {b} AS band, MD5(mh{b * BAND_SIZE + 1} || mh{b * BAND_SIZE + 2}) AS bucket FROM sig"
                for b in range(N_HASHES // BAND_SIZE)
            )}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT c.a_id, c.b_id, COUNT(*) AS n_common
            FROM cand c
            JOIN shingles a ON a.doc_id = c.a_id
            JOIN shingles b ON b.doc_id = c.b_id AND b.shingle = a.shingle
            GROUP BY 1, 2
        ),
        est AS (
            SELECT c.a_id, c.b_id,
                   ({" + ".join(
                       f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
                       for i in range(1, N_HASHES + 1)
                   )}) / {float(N_HASHES)} AS est_jaccard
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.a_id
            JOIN sig sb ON sb.doc_id = c.b_id
        )
        SELECT e.a_id, e.b_id, e.est_jaccard,
               COALESCE(i.n_common
                        / CAST(sa.n + sb.n - i.n_common AS DOUBLE), 0.0)
                   AS exact_jaccard,
               ABS(e.est_jaccard
                   - COALESCE(i.n_common
                              / CAST(sa.n + sb.n - i.n_common AS DOUBLE), 0.0))
                   AS abs_err
        FROM est e
        LEFT JOIN inter i ON i.a_id = e.a_id AND i.b_id = e.b_id
        JOIN sizes sa ON sa.doc_id = e.a_id
        JOIN sizes sb ON sb.doc_id = e.b_id
    """,
)
def minhash_jaccard_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles_multiset(documents, k=SHINGLE_K)
    # read 3x (banding + both signature sides of the estimate join);
    # (doc, 8 slots) rows — tiny; release_cached reclaims it
    sigs = dedup.minhash_signatures(sh, n_hashes=N_HASHES).persist()
    cands = dedup.minhash_band_candidates(
        sigs, n_hashes=N_HASHES, band_size=BAND_SIZE
    )
    exact = dedup.jaccard_pairs(sh, candidates=cands, threshold=0.0).select(
        "a_id", "b_id", F.col("jaccard").alias("_exact")
    )
    slots = [f"mh{i}" for i in range(1, N_HASHES + 1)]
    sa = sigs.select(
        F.col("doc_id").alias("a_id"), *[F.col(s).alias(f"a_{s}") for s in slots]
    )
    sb = sigs.select(
        F.col("doc_id").alias("b_id"), *[F.col(s).alias(f"b_{s}") for s in slots]
    )
    matches = sum(
        F.when(F.col(f"a_{s}") == F.col(f"b_{s}"), 1).otherwise(0) for s in slots
    )
    est = (
        cands.join(sa, on="a_id")
        .join(sb, on="b_id")
        .select(
            "a_id",
            "b_id",
            # divisor derived from N_HASHES (the slot-list source), so
            # changing the signature width cannot silently skew the
            # estimate; the oracle generates its divisor the same way
            (matches / F.lit(float(N_HASHES))).alias("est_jaccard"),
        )
    )
    ex = F.coalesce(F.col("_exact"), F.lit(0.0))
    return (
        est.join(exact, on=["a_id", "b_id"], how="left")
        .select(
            "a_id",
            "b_id",
            "est_jaccard",
            ex.alias("exact_jaccard"),
            F.abs(F.col("est_jaccard") - ex).alias("abs_err"),
        )
    )


@register(
    "embedding_robust_profile",
    op_ids="beyond-reference robust embedding QA gate: per-dimension "
    "median, MAD, and robust-z outlier count (|x - med| > 3*1.4826*"
    "mad) — the rank-based twin of the mean/std standardize moments "
    "(one corrupted import moves a dim's stddev arbitrarily, its MAD "
    "not at all, so n_outliers localizes junk mass); GROUPED_AGG "
    "pandas aggregate over the BOUNDED 64-dim grain, numpy "
    "interpolated median == DuckDB median/mad bit-for-bit (the "
    "mad_by_group contract)",
    description="per-dimension robust profile of the embedding "
    "corpus: count, median, MAD, and 3-sigma-equivalent robust "
    "outlier count",
    oracle="""
        WITH vals AS (
            SELECT d AS dim, CAST(embedding[d] AS DOUBLE) AS x
            FROM embeddings, (SELECT unnest(range(1, 65)) AS d) m
        ),
        st AS (
            SELECT dim, CAST(COUNT(x) AS BIGINT) AS n,
                   median(x) AS med, mad(x) AS mad
            FROM vals GROUP BY 1
        )
        SELECT st.dim, st.n, st.med, st.mad,
               CAST(SUM(CASE WHEN ABS(v.x - st.med)
                                  > 3.0 * 1.4826 * st.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM vals v JOIN st ON st.dim = v.dim
        GROUP BY 1, 2, 3, 4
    """,
)
def embedding_robust_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.embedding_robust_profile(embeddings)


@register(
    "embedding_standardize",
    op_ids="beyond-reference feature normalization (per-dimension "
    "z-scores from exact fixed-point sufficient statistics; 64-key "
    "partial-agg groupBy + broadcast join back — no rounding needed, "
    "the n-cancelling closed form is bit-stable)",
    description="long-form (vec_id, dim, zscore) standardization of "
    "the embedding table — the normalize-before-cluster/probe pass",
    oracle="""
        WITH ex AS (
            SELECT vec_id, CAST(r.i AS BIGINT) AS i,
                   CAST(ROUND(CAST(embedding[CAST(r.i + 1 AS INT)] AS DOUBLE)
                              * 1000000, 0) AS BIGINT) AS x6
            FROM embeddings, range(0, 64) r(i)
        ),
        stats AS (
            SELECT i, COUNT(*) AS n, SUM(x6) AS s, SUM(x6 * x6) AS ss
            FROM ex GROUP BY i
        )
        SELECT e.vec_id, e.i,
               CASE WHEN st.n * st.ss - st.s * st.s = 0 THEN NULL
                    ELSE CAST(e.x6 * st.n - st.s AS DOUBLE)
                         / sqrt(CAST(st.n * st.ss - st.s * st.s AS DOUBLE))
               END AS zscore
        FROM ex e JOIN stats st USING (i)
    """,
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.standardize_embeddings(embeddings)


@register(
    "curriculum_quality_order",
    op_ids="beyond-reference curriculum scheduling (quality-decile "
    "tiers, content-addressed shuffle within tier, scale-safe "
    "two-level rank for the global position — no RNG, no global "
    "sort)",
    description="global training order presenting higher-quality "
    "documents first, md5-shuffled within each quality tier — the "
    "curriculum dataloader feed",
    oracle=r"""
        WITH feats AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
                   length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
                   len(list_filter(string_split_regex(text, '\s+'),
                                   x -> list_contains(['the','a','of','and','is'], lower(x)))) AS n_stop,
                   COALESCE(list_sum(list_transform(
                       list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
                       x -> length(x))), 0) AS sum_tok_len
            FROM documents
        ),
        scored AS (
            SELECT doc_id,
                   (CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 4 ELSE 0 END
                    + CASE WHEN n_punct * 10 < n_chars THEN 2 ELSE 0 END
                    + CASE WHEN n_stop > 0 THEN 2 ELSE 0 END
                    + CASE WHEN sum_tok_len >= 3 * n_tokens
                            AND sum_tok_len <= 10 * n_tokens
                           THEN 2 ELSE 0 END) AS quality_decile
            FROM feats
        )
        SELECT doc_id, quality_decile,
               ROW_NUMBER() OVER (
                   ORDER BY quality_decile DESC,
                            md5('curr-v1|' || CAST(doc_id AS VARCHAR)),
                            doc_id
               ) AS curriculum_pos
        FROM scored
    """,
)
def curriculum_quality_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.sampling import curriculum_order

    (documents,) = load(spark, sf_dir, "documents")
    scored = text.quality_score(documents).select("doc_id", "quality_decile")
    return curriculum_order(scored, "quality_decile").select(
        "doc_id", "quality_decile", "curriculum_pos"
    )


@register(
    "cross_lang_gram_overlap",
    op_ids="beyond-reference cross-language contamination screen: "
    "distinct word-4-gram Jaccard per language pair — gram-keyed "
    "equi-join with per-gram fan-out bounded by the LANGUAGE count, "
    "per-language gram totals equi-joined back; the "
    "translation-leak/boilerplate localizer the per-split "
    "decontamination family misses",
    description="per language pair: shared distinct 4-grams, each "
    "side's gram count, and Jaccard — a spike localizes which pair "
    "carries mechanically duplicated spans",
    oracle=r"""
        WITH ctoks AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ),
        cgrams AS (
            SELECT DISTINCT lang,
                   unnest(list_transform(range(1, len(t) - 2),
                          i -> array_to_string(list_slice(t, i, i + 3), ' ')))
                       AS gram
            FROM ctoks WHERE len(t) >= 4
        ),
        cpairs AS (
            SELECT a.lang AS lang_a, b.lang AS lang_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM cgrams a JOIN cgrams b
              ON a.gram = b.gram AND a.lang < b.lang
            GROUP BY 1, 2
        ),
        ccnt AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_grams
            FROM cgrams GROUP BY 1
        )
        SELECT lang_a, lang_b, n_shared,
               ca.n_grams AS n_grams_a, cb.n_grams AS n_grams_b,
               CAST(n_shared AS DOUBLE)
                   / CAST(ca.n_grams + cb.n_grams - n_shared AS DOUBLE)
                   AS jaccard
        FROM cpairs
        JOIN ccnt ca ON lang_a = ca.lang
        JOIN ccnt cb ON lang_b = cb.lang
    """,
)
def cross_lang_gram_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.cross_lang_gram_overlap(documents, n=4)


@register(
    "cross_source_overlap",
    op_ids="beyond-reference cross-corpus duplication matrix (distinct "
    "(source, chunk-md5) reduction first; chunk-keyed self-join whose "
    "fan-out is dimension-squared per key, never doc-pair work)",
    description="for every source pair: shared distinct 8-token "
    "chunks and chunk-set Jaccard — the 'is corpus B a mirror of "
    "corpus A' gate before paying to ingest a new source",
    oracle="""
        WITH base AS (
            SELECT source,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents
        ),
        sc AS (
            SELECT DISTINCT source,
                   md5(array_to_string(ts[(i*8+1):(i*8+8)], ' ')) AS chunk_hash
            FROM (SELECT source, ts,
                         CAST(unnest(range(0, CAST(ceil(len(ts)/8.0) AS BIGINT)))
                              AS BIGINT) AS i
                  FROM base WHERE len(ts) > 0)
        ),
        sizes AS (SELECT source, COUNT(*) AS n FROM sc GROUP BY source),
        inter AS (
            SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
            FROM sc a JOIN sc b
              ON a.chunk_hash = b.chunk_hash AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
               CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
               n_common / CAST(sa.n + sb.n - n_common AS DOUBLE)
                   AS chunk_jaccard
        FROM inter
        JOIN sizes sa ON sa.source = src_a
        JOIN sizes sb ON sb.source = src_b
    """,
)
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.source_overlap_matrix(documents, chunk_tokens=8)


@register(
    "dedup_rate_by_source",
    op_ids="beyond-reference per-source dedup health report "
    "(fingerprint-keyed occurrence counts joined back, one per-group "
    "rollup; cross-source copies counted in every holding source)",
    description="per source: docs, docs whose normalized content "
    "occurs >= 2 times corpus-wide, and the duplicate rate — the "
    "before/after dashboard of a dedup run",
    oracle=r"""
        WITH fps AS (
            SELECT source, doc_id,
                   MD5(trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp
            FROM documents
        ),
        occ AS (SELECT fp, COUNT(*) AS nc FROM fps GROUP BY fp)
        SELECT f.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN o.nc >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_docs,
               ROUND(SUM(CASE WHEN o.nc >= 2 THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 6) + 0.0 AS dup_rate
        FROM fps f JOIN occ o USING (fp)
        GROUP BY f.source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.dedup_rate_by_group(documents, group_col="source")


@register(
    "zipf_corpus_fit",
    op_ids="beyond-reference corpus-shape diagnostic (Zipf slope: "
    "ln-frequency vs ln-rank OLS on exact fixed-point integers over "
    "the top-128 TakeOrdered cut)",
    description="OLS slope of ln(freq) on ln(rank) for the top-128 "
    "terms — natural corpora sit near -1; the one-number health "
    "metric per ingest batch",
    oracle="""
        WITH counts AS (
            SELECT term, COUNT(*) AS c FROM (
                SELECT unnest(list_filter(string_split(text, ' '),
                                          t -> t <> '')) AS term
                FROM documents)
            GROUP BY term ORDER BY c DESC, term ASC LIMIT 128
        ),
        pts AS (
            SELECT CAST(ROUND(ROUND(ln(CAST(ROW_NUMBER() OVER (
                           ORDER BY c DESC, term ASC) AS DOUBLE)), 6) * 1e6, 0)
                        AS BIGINT) AS x,
                   CAST(ROUND(ROUND(ln(CAST(c AS DOUBLE)), 6) * 1e6, 0)
                        AS BIGINT) AS y
            FROM counts
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM pts
        )
        SELECT n AS n_terms,
               CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)
               END AS zipf_slope,
               CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                    ELSE (CAST(sy AS DOUBLE)
                          - CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(sx AS DOUBLE)) / n
               END AS zipf_intercept
        FROM stats
    """,
)
def zipf_corpus_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.zipf_fit(documents, top_n=128)


@register(
    "ivf_recall_eval",
    op_ids="beyond-reference IVF index evaluation (recall@k of the "
    "nprobe=1 cell probe vs the exact scan over a deterministic "
    "query sample — measures what single-cell pruning costs before "
    "raising nprobe; broadcast-only ground-truth arm)",
    description="recall@10 per sampled query (vec_id % 25 == 0) of "
    "the IVF single-cell probe against exact cosine top-10",
    oracle=f"""
        WITH {_IVF_ASSIGN_CTE},
        qs AS (SELECT vec_id AS qid, embedding AS qe
               FROM embeddings WHERE vec_id % 25 = 0),
        exact_dots AS (
            SELECT qid, vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT q.qid, e.vec_id,
                         unnest(e.embedding) AS x, unnest(q.qe) AS y
                  FROM embeddings e, qs q WHERE e.vec_id <> q.qid)
            GROUP BY qid, vec_id
        ),
        exact_top AS (
            SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid
                           ORDER BY ROUND(dot / (sqrt(na) * sqrt(nq)), 6) DESC,
                                    vec_id ASC) AS rn
                FROM exact_dots) WHERE rn <= 10
        ),
        qcell AS (SELECT qs.qid, a.cell_id FROM assign a
                  JOIN qs ON a.vec_id = qs.qid),
        cand AS (SELECT qc.qid, a.vec_id FROM qcell qc
                 JOIN assign a ON a.cell_id = qc.cell_id
                                AND a.vec_id <> qc.qid),
        appr_dots AS (
            SELECT qid, vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT c.qid, e.vec_id,
                         unnest(e.embedding) AS x, unnest(q.qe) AS y
                  FROM cand c
                  JOIN embeddings e ON e.vec_id = c.vec_id
                  JOIN qs q ON q.qid = c.qid)
            GROUP BY qid, vec_id
        ),
        appr_top AS (
            SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid
                           ORDER BY ROUND(dot / (sqrt(na) * sqrt(nq)), 6) DESC,
                                    vec_id ASC) AS rn
                FROM appr_dots) WHERE rn <= 10
        )
        SELECT et.qid AS query_id,
               CAST(COUNT(*) AS BIGINT) AS n_exact,
               CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               ROUND(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 6) + 0.0 AS recall_at_k
        FROM exact_top et
        LEFT JOIN appr_top ap ON ap.qid = et.qid AND ap.vec_id = et.vec_id
        GROUP BY et.qid
    """,
)
def ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.ivf_recall_at_k(
        embeddings, n_centroids=8, k=10, sample_mod=25
    )


@register(
    "matryoshka_recall_eval",
    op_ids="beyond-reference Matryoshka/MRL truncation evaluation: "
    "recall@10 of 16-of-64-dim prefix cosine against the full-dim "
    "exact scan over the deterministic query sample — the decision "
    "gate before adopting prefix-dim ANN (4x less vector memory/"
    "bandwidth) with full-dim re-rank; both arms broadcast only the "
    "sampled queries, per-side norms folded once per row, 6dp cosine "
    "+ id tie-break make both top-k sets engine-exact",
    description="recall@10 per sampled query (vec_id % 25 == 0) of "
    "cosine search on the first 16 of 64 embedding dims vs exact "
    "full-dimension top-10",
    oracle="""
        WITH qs AS (SELECT vec_id AS qid, embedding AS qe
                    FROM embeddings WHERE vec_id % 25 = 0),
        exact_dots AS (
            SELECT qid, vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT q.qid, e.vec_id,
                         unnest(e.embedding) AS x, unnest(q.qe) AS y
                  FROM embeddings e, qs q WHERE e.vec_id <> q.qid)
            GROUP BY qid, vec_id
        ),
        exact_top AS (
            SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid
                           ORDER BY ROUND(dot / (sqrt(na) * sqrt(nq)), 6) DESC,
                                    vec_id ASC) AS rn
                FROM exact_dots) WHERE rn <= 10
        ),
        pre_dots AS (
            SELECT qid, vec_id,
                   SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                   SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                   SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
            FROM (SELECT q.qid, e.vec_id,
                         unnest(list_slice(e.embedding, 1, 16)) AS x,
                         unnest(list_slice(q.qe, 1, 16)) AS y
                  FROM embeddings e, qs q WHERE e.vec_id <> q.qid)
            GROUP BY qid, vec_id
        ),
        pre_top AS (
            SELECT qid, vec_id FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid
                           ORDER BY ROUND(dot / (sqrt(na) * sqrt(nq)), 6) DESC,
                                    vec_id ASC) AS rn
                FROM pre_dots) WHERE rn <= 10
        )
        SELECT et.qid AS query_id,
               CAST(COUNT(*) AS BIGINT) AS n_exact,
               CAST(SUM(CASE WHEN pt.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               ROUND(SUM(CASE WHEN pt.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 6) + 0.0 AS recall_at_k
        FROM exact_top et
        LEFT JOIN pre_top pt ON pt.qid = et.qid AND pt.vec_id = et.vec_id
        GROUP BY et.qid
    """,
)
def matryoshka_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.matryoshka_recall_at_k(
        embeddings, prefix_dim=16, k=10, sample_mod=25
    )


@register(
    "pq_distortion_report",
    op_ids="beyond-reference PQ quantization-quality evaluation "
    "(per-subspace reconstruction error + codebook utilization over "
    "the pq_encode output — the distortion gate before shipping a "
    "codebook; decimal-exact error sums)",
    description="per PQ subspace: vectors encoded, mean/max squared "
    "reconstruction error, distinct codes used of the 8 available — "
    "a subspace with high distortion or dead codes needs retraining",
    oracle="""
        WITH subs AS (
            SELECT vec_id, s.subspace,
                   list_slice(embedding, s.subspace * 16 + 1,
                              s.subspace * 16 + 16) AS subvec
            FROM embeddings,
                 LATERAL (SELECT unnest(generate_series(0, 3)) AS subspace) s
        ),
        codes AS (
            SELECT vec_id AS code_id, subspace, subvec AS codevec
            FROM subs WHERE vec_id < 8
        ),
        scored AS (
            SELECT vec_id, subspace, code_id,
                   ROUND(SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                             * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 6)
                       AS dist
            FROM (SELECT v.vec_id, v.subspace, c.code_id,
                         unnest(v.subvec) AS x, unnest(c.codevec) AS y
                  FROM subs v JOIN codes c USING (subspace))
            GROUP BY 1, 2, 3
        ),
        best AS (
            SELECT vec_id, subspace, code_id AS code, dist
            FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY vec_id, subspace
                      ORDER BY dist ASC, code_id ASC) AS rn
                  FROM scored)
            WHERE rn = 1
        )
        SELECT CAST(subspace AS BIGINT) AS subspace,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(SUM(CAST(dist AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
                   AS mean_sqdist,
               MAX(dist) AS max_sqdist,
               CAST(COUNT(DISTINCT code) AS BIGINT) AS n_codes_used
        FROM best GROUP BY subspace
    """,
)
def pq_distortion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    enc = similarity.pq_encode(embeddings, dim=64, m=4, n_codes=8)
    return (
        enc.groupBy(F.col("subspace").cast("long").alias("subspace"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            (
                F.sum(F.col("dist").cast("decimal(24,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_sqdist"),
            F.max("dist").alias("max_sqdist"),
            F.count_distinct("code").alias("n_codes_used"),
        )
    )


@register(
    "gram_power_iteration",
    op_ids="beyond-reference distributed PCA step (power iteration on "
    "the exact fixed-point Gram: corpus reduces to O(d^2) cells in "
    "one pass, the matvec + normalization run on d-row relations in "
    "exact DECIMAL — the reduce-then-eigensolve PCA pattern)",
    description="one power-iteration step v = G*1/||G*1|| on the "
    "embedding Gram matrix — the normalized dominant-direction "
    "estimate PCA/whitening starts from",
    oracle="""
        WITH cells0 AS (
            SELECT CAST(r1.i AS BIGINT) AS i, CAST(r2.j AS BIGINT) AS j,
                   CAST(ROUND(CAST(e.embedding[CAST(r1.i + 1 AS INT)] AS DOUBLE)
                              * 1000000, 0) AS BIGINT)
                   * CAST(ROUND(CAST(e.embedding[CAST(r2.j + 1 AS INT)] AS DOUBLE)
                                * 1000000, 0) AS BIGINT) AS p
            FROM embeddings e, range(0, 64) r1(i), range(0, 64) r2(j)
            WHERE r2.j >= r1.i
        ),
        cells AS (
            SELECT i, j,
                   ROUND(CAST(SUM(p) AS DOUBLE) / 1000000000000.0, 6) + 0.0
                       AS gram
            FROM cells0 GROUP BY i, j
        ),
        fullm AS (
            SELECT i, j, gram FROM cells
            UNION ALL
            SELECT j AS i, i AS j, gram FROM cells WHERE i < j
        ),
        w AS (
            SELECT i, CAST(SUM(CAST(gram AS DECIMAL(24,6)))
                           AS DECIMAL(18,6)) AS wd
            FROM fullm GROUP BY i
        ),
        nrm AS (SELECT sqrt(CAST(SUM(wd * wd) AS DOUBLE)) AS nv FROM w)
        SELECT i, CAST(wd AS DOUBLE) / nv AS component
        FROM w, nrm
    """,
)
def gram_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return similarity.gram_power_step(embeddings)


@register(
    "tokenizer_fertility_by_lang",
    op_ids="beyond-reference tokenizer fertility report (chars/token "
    "per language — one map-side-combined aggregate; exact-integer "
    "ratio)",
    description="per language: docs, whitespace tokens, characters, "
    "and chars-per-token — the fertility planning number (CJK vs "
    "Latin) a tokenizer budget is sized from",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                                        t -> t <> ''))) AS BIGINT) AS n_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars,
               CAST(SUM(length(text)) AS BIGINT)
                   / CAST(SUM(len(list_filter(string_split(text, ' '),
                                              t -> t <> ''))) AS DOUBLE)
                   AS chars_per_token
        FROM documents GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    n_toks = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    return (
        documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_toks).cast("long").alias("n_tokens"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_chars",
            (F.col("n_chars") / F.col("n_tokens").cast("double")).alias(
                "chars_per_token"
            ),
        )
    )


@register(
    "training_manifest_assembly",
    op_ids="beyond-reference END-TO-END training-data assembly in one "
    "lazy plan: quality gate -> exact dedup (fingerprint-keyed, text "
    "never shuffles) -> deterministic 80% train split -> content-"
    "addressed corpus shuffle (two-level rank) -> distributed prefix-"
    "sum token spans over the shuffled order. The manifest a "
    "dataloader consumes, produced as ONE Spark job",
    description="per kept train document: its reproducible shuffle "
    "position, token count, absolute token start offset and first "
    "512-token training block — gate, dedup, split, shuffle and pack "
    "composed end to end",
    oracle=r"""
        WITH feats AS (
            SELECT doc_id, text,
                   length(text) AS n_chars,
                   length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                       AS n_punct
            FROM documents
        ),
        gated AS (
            SELECT doc_id, text FROM feats
            WHERE n_chars BETWEEN 100 AND 20000 AND n_punct * 10 < n_chars
        ),
        reps AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY MD5(text)),
        kept AS (SELECT g.doc_id, g.text FROM gated g
                 JOIN reps r ON g.doc_id = r.doc_id),
        train AS (
            SELECT doc_id, text FROM kept
            WHERE substring(md5('split-v1|' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < 'cccccccc'
        ),
        counted AS (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), t -> t <> ''))
                       AS n_tokens
            FROM train
        ),
        shuffled AS (
            SELECT doc_id, n_tokens,
                   ROW_NUMBER() OVER (
                       ORDER BY md5('asm-v1|' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS shuffle_pos
            FROM counted
        ),
        cum AS (
            SELECT *,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY shuffle_pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS start_offset
            FROM shuffled
        )
        SELECT doc_id, CAST(shuffle_pos AS BIGINT) AS shuffle_pos,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(start_offset AS BIGINT) AS start_offset,
               CAST(start_offset // 512 AS BIGINT) AS first_block
        FROM cum
    """,
)
def training_manifest_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators import packing, sampling

    (documents,) = load(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    gated = documents.select("doc_id", "text").filter(
        n_chars.between(100, 20000) & (n_punct * 10 < n_chars)
    )
    reps = (
        gated.groupBy(F.md5("text").alias("_fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = gated.join(reps, on="doc_id", how="left_semi")
    split = sampling.hash_split(
        kept.select("doc_id"),
        ["doc_id"],
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="split-v1",
    ).filter(F.col("split") == "train")
    train = kept.join(split.select("doc_id"), on="doc_id", how="left_semi")
    counted = train.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        .cast("long")
        .alias("n_tokens"),
    )
    shuffled = sampling.deterministic_shuffle(
        counted, key_cols=["doc_id"], salt="asm-v1"
    ).select("doc_id", "n_tokens", "shuffle_pos")
    spans = packing.token_spans(
        shuffled, id_col="shuffle_pos", weight_col="n_tokens", block_size=512
    )
    return spans.select(
        "doc_id",
        F.col("shuffle_pos").cast("long").alias("shuffle_pos"),
        "n_tokens",
        "start_offset",
        "first_block",
    )


@register(
    "cross_split_contamination",
    op_ids="beyond-reference train/test NEAR-DUP decontamination "
    "(MinHash LSH candidates restricted to pairs crossing the "
    "deterministic split boundary, exact-Jaccard verified — the "
    "eval-integrity gate ngram_contamination's exact matching "
    "misses when the leaked copy is lightly edited)",
    description="test-split documents whose shingle Jaccard with some "
    "train-split document is >= 0.5, with the offending train doc — "
    "candidates from LSH banding, cross-boundary pairs only",
    oracle=f"""
        WITH {_SHINGLES_CTE}, {_SIG_CTE},
        split AS (
            SELECT doc_id,
                   CASE WHEN substring(md5('split-v1|' || CAST(doc_id AS VARCHAR)), 1, 8)
                             < 'cccccccc' THEN 'train' ELSE 'heldout' END AS split
            FROM documents
        ),
        bands AS (
            {" UNION ALL ".join(
                f"SELECT doc_id, {b} AS band, MD5(mh{b * BAND_SIZE + 1} || mh{b * BAND_SIZE + 2}) AS bucket FROM sig"
                for b in range(N_HASHES // BAND_SIZE)
            )}
        ),
        cand AS (
            SELECT DISTINCT tr.doc_id AS train_id, te.doc_id AS test_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id <> b.doc_id
            JOIN split tr ON tr.doc_id = a.doc_id AND tr.split = 'train'
            JOIN split te ON te.doc_id = b.doc_id AND te.split = 'heldout'
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT c.train_id, c.test_id, COUNT(*) AS n_common
            FROM cand c
            JOIN shingles a ON a.doc_id = c.train_id
            JOIN shingles b ON b.doc_id = c.test_id AND b.shingle = a.shingle
            GROUP BY 1, 2
        )
        SELECT i.test_id, i.train_id,
               i.n_common / CAST(st.n + se.n - i.n_common AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes st ON st.doc_id = i.train_id
        JOIN sizes se ON se.doc_id = i.test_id
        WHERE i.n_common / CAST(st.n + se.n - i.n_common AS DOUBLE) >= 0.5
    """,
)
def cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators import sampling

    (documents,) = load(spark, sf_dir, "documents")
    split = sampling.hash_split(
        documents.select("doc_id"), ["doc_id"], {"train": 0.8, "heldout": 0.2},
        salt="split-v1",
    )
    sh = dedup.char_shingles_multiset(documents, k=SHINGLE_K)
    sigs = dedup.minhash_signatures(sh, n_hashes=N_HASHES)
    cands = dedup.minhash_band_candidates(
        sigs, n_hashes=N_HASHES, band_size=BAND_SIZE
    )
    # candidates are undirected (a < b); orient both ways, then keep
    # only pairs crossing the split boundary (train -> heldout)
    both = cands.select(
        F.col("a_id").alias("train_id"), F.col("b_id").alias("test_id")
    ).unionByName(
        cands.select(
            F.col("b_id").alias("train_id"), F.col("a_id").alias("test_id")
        )
    )
    tr = split.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_id")
    )
    te = split.filter(F.col("split") == "heldout").select(
        F.col("doc_id").alias("test_id")
    )
    crossing = both.join(tr, on="train_id").join(te, on="test_id")
    verified = dedup.jaccard_pairs(
        sh,
        candidates=crossing.select(
            F.col("train_id").alias("a_id"), F.col("test_id").alias("b_id")
        ),
        threshold=0.5,
    )
    return verified.select(
        F.col("b_id").alias("test_id"),
        F.col("a_id").alias("train_id"),
        "jaccard",
    )

def _lang_confusion_oracle() -> str:
    return f"""
        WITH preds AS ({_lang_id_oracle()}),
        joined AS (
            SELECT d.lang AS true_lang, p.pred_lang
            FROM documents d JOIN preds p USING (doc_id)
        ),
        cells AS (
            SELECT true_lang, pred_lang, COUNT(*) AS n
            FROM joined GROUP BY 1, 2
        ),
        tot AS (SELECT true_lang, SUM(n) AS n_true FROM cells GROUP BY 1)
        SELECT c.true_lang, c.pred_lang, CAST(c.n AS BIGINT) AS n,
               CAST(t.n_true AS BIGINT) AS n_true,
               c.n / CAST(t.n_true AS DOUBLE) AS recall_share
        FROM cells c JOIN tot t USING (true_lang)
    """


@register(
    "lang_id_confusion",
    op_ids="beyond-reference model evaluation: confusion matrix of "
    "the language-ID heuristic against the gold lang column "
    "(prediction join on the id key, dimension-squared aggregate, "
    "exact-count recall shares)",
    description="(true lang, predicted lang) counts with each cell's "
    "share of the true class — the error-analysis matrix showing "
    "WHICH languages the classifier confuses, not just how often it "
    "is wrong",
    oracle=_lang_confusion_oracle(),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    preds = text.lang_id(documents).select("doc_id", "pred_lang")
    joined = documents.select("doc_id", F.col("lang").alias("true_lang")).join(
        preds, on="doc_id"
    )
    cells = joined.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cells.groupBy("true_lang").agg(F.sum("n").cast("long").alias("n_true"))
    return (
        cells.join(F.broadcast(tot), on="true_lang")
        .select(
            "true_lang",
            "pred_lang",
            "n",
            "n_true",
            (F.col("n") / F.col("n_true").cast("double")).alias("recall_share"),
        )
    )


# ---------------------------------------------------------------------------
# round-4 additions: budgeted selection, leakage-safe splitting,
# span-level rewrite dedup, DSIR importance weighting
# ---------------------------------------------------------------------------


@register(
    "stratified_kfold_assign",
    op_ids="beyond-reference stratified k-fold assignment (per-stratum "
    "two-level rank -> round-robin fold; exactly balanced within "
    "every stratum, no unpartitioned window, no RNG)",
    description="5-fold cross-validation labels balanced within each "
    "language: content-hash rank within stratum, fold = (rank-1) % 5 "
    "— per-stratum fold sizes differ by at most one row",
    oracle="""
        SELECT doc_id, lang,
               CAST((ROW_NUMBER() OVER (
                        PARTITION BY lang
                        ORDER BY md5('kfold-v1|' || CAST(doc_id AS VARCHAR)),
                                 doc_id
                    ) - 1) % 5 AS INTEGER) AS fold
        FROM documents
    """,
)
def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return sampling.stratified_kfold(
        documents.select("doc_id", "lang"),
        "lang",
        k=5,
        id_cols=["doc_id"],
        salt="kfold-v1",
    ).select("doc_id", "lang", "fold")


@register(
    "token_budget_selection",
    op_ids="beyond-reference budgeted corpus selection (distributed "
    "prefix sum over the curriculum order: composite score+hash "
    "bucket, per-bucket cumsum windows, one bounded totals relation "
    "— the fill-the-token-budget-best-first pass)",
    description="documents selected best-quality-first (hash-shuffled "
    "within each quality tier) while the running whitespace-token "
    "total stays within a 20k budget; cum_weight is the running "
    "total including the row",
    oracle=r"""
        WITH feats AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
                   length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
                   len(list_filter(string_split_regex(text, '\s+'),
                                   x -> list_contains(['the','a','of','and','is'], lower(x)))) AS n_stop,
                   COALESCE(list_sum(list_transform(
                       list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
                       x -> length(x))), 0) AS sum_tok_len
            FROM documents
        ),
        scored AS (
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   (CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 4 ELSE 0 END
                    + CASE WHEN n_punct * 10 < n_chars THEN 2 ELSE 0 END
                    + CASE WHEN n_stop > 0 THEN 2 ELSE 0 END
                    + CASE WHEN sum_tok_len >= 3 * n_tokens
                            AND sum_tok_len <= 10 * n_tokens
                           THEN 2 ELSE 0 END) AS quality_decile
            FROM feats
        ),
        cum AS (
            SELECT doc_id, quality_decile, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       ORDER BY quality_decile DESC,
                                md5('tb-v1|' || CAST(doc_id AS VARCHAR)),
                                doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS cum_weight
            FROM scored
        )
        SELECT doc_id, CAST(quality_decile AS BIGINT) AS quality_decile,
               n_tokens, cum_weight
        FROM cum WHERE cum_weight <= 20000
    """,
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    scored = text.quality_score(documents).select(
        "doc_id", "quality_decile", "n_tokens"
    )
    return sampling.budget_select(
        scored, "quality_decile", "n_tokens", budget=20000, salt="tb-v1"
    ).select("doc_id", "quality_decile", "n_tokens", "cum_weight")


@register(
    "leakage_safe_split",
    op_ids="beyond-reference leakage-safe split assignment (near-dup "
    "connected components -> split hashed on the CLUSTER id, so "
    "near-duplicate documents can never straddle train/test — the "
    "contamination-proof split; singleton docs hash on their own id)",
    description="80/10/10 train/val/test labels assigned at near-dup-"
    "cluster granularity: every member of a duplicate cluster lands "
    "in the same split",
    oracle=f"""
        WITH clusters AS ({_NEAR_DUP_CLUSTERS_ORACLE})
        SELECT d.doc_id,
               COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
               CASE WHEN substring(md5('leak-v1|' ||
                         CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 8)
                         < 'cccccccc' THEN 'train'
                    WHEN substring(md5('leak-v1|' ||
                         CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 8)
                         < 'e6666666' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents d LEFT JOIN clusters c USING (doc_id)
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles_multiset(documents, k=SHINGLE_K)
    sh = sh.persist()
    sig = dedup.minhash_signatures(sh, n_hashes=N_HASHES)
    cand = dedup.minhash_band_candidates(
        sig, n_hashes=N_HASHES, band_size=BAND_SIZE
    )
    pairs = dedup.jaccard_pairs(sh, candidates=cand, threshold=0.5).select(
        "a_id", "b_id"
    )
    cc = dedup.connected_components(pairs)
    withc = (
        documents.select("doc_id")
        .join(cc.select("doc_id", "cluster_id"), on="doc_id", how="left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    return sampling.hash_split(
        withc,
        ["cluster_id"],
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="leak-v1",
    ).select("doc_id", "cluster_id", "split")


@register(
    "duplicate_span_removal",
    op_ids="beyond-reference exact duplicated-span REMOVAL (Lee et al. "
    "ExactSubstr rewrite at token-chunk granularity: one corpus-wide "
    "canonical copy survives; chunks shuffle as md5, text shuffles "
    "once for the stitch)",
    description="every 8-token chunk occurring in >= 2 documents is "
    "deleted except its first occurrence (min doc, then min index); "
    "clean_text is the surviving chunks re-joined in order",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents
        ),
        nb AS (
            SELECT doc_id, ts, CAST(ceil(len(ts)/8.0) AS BIGINT) AS n_chunks
            FROM base WHERE len(ts) > 0
        ),
        chunks AS (
            SELECT doc_id, i,
                   md5(array_to_string(ts[(i*8+1):(i*8+8)], ' ')) AS h
            FROM (SELECT doc_id, ts,
                         CAST(unnest(range(0, n_chunks)) AS BIGINT) AS i
                  FROM nb)
        ),
        occ AS (
            SELECT h, COUNT(DISTINCT doc_id) AS nd, MIN(doc_id) AS mdoc
            FROM chunks GROUP BY h
        ),
        fi AS (
            SELECT c.h, MIN(c.i) AS fi
            FROM chunks c JOIN occ o ON c.h = o.h AND c.doc_id = o.mdoc
            GROUP BY c.h
        ),
        kept AS (
            SELECT c.doc_id, c.i
            FROM chunks c JOIN occ o ON c.h = o.h JOIN fi ON c.h = fi.h
            WHERE o.nd < 2 OR (c.doc_id = o.mdoc AND c.i = fi.fi)
        ),
        agg AS (
            SELECT doc_id, list_sort(list(i)) AS ki,
                   CAST(COUNT(*) AS BIGINT) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT n.doc_id, n.n_chunks,
               n.n_chunks - COALESCE(a.n_kept, 0) AS n_removed,
               COALESCE(array_to_string(flatten(list_transform(
                   a.ki, i -> n.ts[(i*8+1):(i*8+8)])), ' '), '') AS clean_text
        FROM nb n LEFT JOIN agg a USING (doc_id)
    """,
)
def duplicate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return dedup.remove_duplicate_spans(documents, chunk_tokens=8)


@register(
    "dsir_importance_weights",
    op_ids="beyond-reference DSIR importance weighting (Xie et al. "
    "2023: hashed-unigram log-ratio of target-slice vs corpus "
    "distributions; one explode feeds both arms, B-row ratio table "
    "broadcasts back)",
    description="per-document target-likeness weight: sum over tokens "
    "of ln p_target(bucket) - ln p_corpus(bucket), add-one smoothed, "
    "6dp-decimal-exact; selected = net more target-like (here the "
    "target slice is the English documents)",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM documents
        ),
        bt AS (
            SELECT doc_id,
                   ({_hex_int_sql("md5(tok)", 4)} % 256) AS b,
                   lang
            FROM toks
        ),
        counts AS (
            SELECT b, COUNT(*) AS cs,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
            FROM bt GROUP BY b
        ),
        lr AS (
            SELECT b,
                   CAST(round(ln(CAST(ct + 1 AS DOUBLE)
                                 / CAST((SUM(ct) OVER ()) + 256 AS DOUBLE)), 6)
                        AS DECIMAL(12,6))
                   - CAST(round(ln(CAST(cs + 1 AS DOUBLE)
                                   / CAST((SUM(cs) OVER ()) + 256 AS DOUBLE)), 6)
                          AS DECIMAL(12,6)) AS lr
            FROM counts
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(lr) AS DOUBLE) AS dsir_logratio,
               CAST(SUM(lr) AS DOUBLE) > 0.0 AS selected
        FROM bt JOIN lr USING (b)
        GROUP BY doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.dsir_logratio_weights(
        documents, target_pred=F.col("lang") == "en", n_buckets=256
    )


_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, "
    f"MD5(mh{b * BAND_SIZE + 1} || mh{b * BAND_SIZE + 2}) AS bucket FROM sig"
    for b in range(N_HASHES // BAND_SIZE)
)


@register(
    "lsh_candidate_quality",
    op_ids="beyond-reference index evaluation: precision/recall of "
    "the MinHash-LSH candidate generator against exact-Jaccard "
    "ground truth — the before-you-trust-the-sketch gate for the "
    "dedup pipeline (complements minhash_jaccard_error, which "
    "evaluates the estimator, not the bucketing)",
    description="LSH band candidates vs exact shingle-Jaccard >= 0.5 "
    "pairs over the deterministic doc_id%2==0 half-sample: candidate "
    "count, true-pair count, overlap, precision and recall — the "
    "eval universe is sampled (both arms identically restricted, the "
    "ann_recall_eval pattern) because ground truth is the expensive "
    "arm by construction; grow the sample modulus with the corpus",
    oracle=f"""
        WITH {_SHINGLES_CTE.replace("FROM documents)", "FROM documents WHERE doc_id % 2 = 0)")}, {_SIG_CTE},
        bands AS ({_BANDS_SQL}),
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
            FROM shingles a JOIN shingles b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        truth AS (
            SELECT a_id, b_id FROM inter
            JOIN sizes sa ON sa.doc_id = a_id
            JOIN sizes sb ON sb.doc_id = b_id
            WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.5
        ),
        m AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
                   (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM cand JOIN truth USING (a_id, b_id)) AS n_hit
        )
        SELECT n_candidates, n_true, n_hit,
               CASE WHEN n_candidates = 0 THEN 0.0
                    ELSE round(n_hit / CAST(n_candidates AS DOUBLE), 6) + 0.0
               END AS precision_lsh,
               CASE WHEN n_true = 0 THEN 0.0
                    ELSE round(n_hit / CAST(n_true AS DOUBLE), 6) + 0.0
               END AS recall_lsh
        FROM m
    """,
)
def lsh_candidate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    # Deterministic half-sample of the eval universe (VERDICT r5 item
    # 3): the exact ground-truth arm is quadratic-ish in sample size,
    # so the eval — not the production candidate generator — runs on
    # doc_id%2==0, the same restriction applied to BOTH arms and the
    # oracle. ~4x cheaper, still 6-12 true pairs at the check scales.
    documents = documents.where(F.col("doc_id") % 2 == 0)
    sh = dedup.char_shingles(documents, k=SHINGLE_K)
    # materialize the shared shingle relation BEFORE the two arms fan
    # out (VERDICT r6 item 3): a lazily-persisted frame referenced by
    # both the LSH arm and the exact-PPJoin truth arm inside ONE final
    # job lets parallel subtrees race to populate the cache and
    # recompute the explode; one count() pins it
    sh = sh.persist()
    sh.count()
    sig = dedup.minhash_signatures(sh, n_hashes=N_HASHES)
    cand = dedup.minhash_band_candidates(
        sig, n_hashes=N_HASHES, band_size=BAND_SIZE
    )
    cand = cand.persist()  # counted AND joined against truth
    # ground truth via the PPJoin exact set-similarity join — provably
    # the same pair set as the all-pairs join (zero recall loss, the
    # oracle IS all-pairs SQL) at subquadratic cost
    truth = dedup.prefix_filter_jaccard_pairs(sh, threshold=0.5).select(
        "a_id", "b_id"
    )
    truth = truth.persist()
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_true = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    n_hit = cand.join(truth, on=["a_id", "b_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    m = n_cand.crossJoin(n_true).crossJoin(n_hit)
    prec = F.when(F.col("n_candidates") == 0, F.lit(0.0)).otherwise(
        F.round(F.col("n_hit") / F.col("n_candidates").cast("double"), 6)
        + F.lit(0.0)
    )
    rec = F.when(F.col("n_true") == 0, F.lit(0.0)).otherwise(
        F.round(F.col("n_hit") / F.col("n_true").cast("double"), 6) + F.lit(0.0)
    )
    return m.select(
        "n_candidates",
        "n_true",
        "n_hit",
        prec.alias("precision_lsh"),
        rec.alias("recall_lsh"),
    )


@register(
    "media_byte_class_stats",
    op_ids="beyond-reference mapInArrow media profiling (zero-copy "
    "Arrow-buffer kernel: one numpy view over the batch's data "
    "buffer, offset-indexed cumulative sums — no pandas, no per-row "
    "Python objects; completes the Python-execution API surface "
    "alongside mapInPandas/applyInPandas/pandas_udf/UDTF)",
    description="per-media byte-class profile (total/ASCII/space "
    "bytes + ASCII ratio) computed straight off the Arrow buffers — "
    "the modality/encoding sniff before routing payloads to "
    "decoders",
    oracle=r"""
        SELECT doc_id AS media_id,
               CAST(COALESCE(octet_length(encode(text)), 0) AS BIGINT) AS n_bytes,
               CAST(COALESCE(length(regexp_replace(text, '[^\x00-\x7f]', '', 'g')), 0)
                    AS BIGINT) AS n_ascii,
               CAST(COALESCE(length(text) - length(replace(text, ' ', '')), 0)
                    AS BIGINT) AS n_spaces,
               CASE WHEN COALESCE(octet_length(encode(text)), 0) > 0
                    THEN CAST(length(regexp_replace(text, '[^\x00-\x7f]', '', 'g'))
                              AS DOUBLE)
                         / CAST(octet_length(encode(text)) AS DOUBLE)
                    ELSE 0.0 END AS ascii_ratio
        FROM documents
    """,
)
def media_byte_class_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    media = multimodal.as_media_table(documents)
    return multimodal.byte_class_stats(media)


@register(
    "cluster_best_representative",
    op_ids="beyond-reference dedup representative policy: keep the "
    "BEST-quality member of every near-dup cluster (max quality, "
    "then min id — two keyed partial aggs, no window), not the "
    "arbitrary min-id copy",
    description="per near-dup cluster: member count, the chosen "
    "representative doc and its quality tier — the keep-the-best "
    "dedup policy real curation pipelines apply before dropping "
    "duplicates",
    oracle=f"""
        WITH clusters AS ({_NEAR_DUP_CLUSTERS_ORACLE}),
        cmap AS (
            SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN clusters c USING (doc_id)
        ),
        feats AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens,
                   length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
                   len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> list_contains(['the','a','of','and','is'], lower(x)))) AS n_stop,
                   COALESCE(list_sum(list_transform(
                       list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
                       x -> length(x))), 0) AS sum_tok_len
            FROM documents
        ),
        scored AS (
            SELECT doc_id,
                   CAST(CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 4 ELSE 0 END
                        + CASE WHEN n_punct * 10 < n_chars THEN 2 ELSE 0 END
                        + CASE WHEN n_stop > 0 THEN 2 ELSE 0 END
                        + CASE WHEN sum_tok_len >= 3 * n_tokens
                               AND sum_tok_len <= 10 * n_tokens
                              THEN 2 ELSE 0 END AS BIGINT) AS quality_decile
            FROM feats
        ),
        j AS (
            SELECT cluster_id, s.doc_id, quality_decile
            FROM cmap JOIN scored s USING (doc_id)
        ),
        mq AS (
            SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
                   MAX(quality_decile) AS rep_quality
            FROM j GROUP BY cluster_id
        )
        SELECT mq.cluster_id, mq.n_members,
               MIN(j.doc_id) AS rep_doc, mq.rep_quality
        FROM j JOIN mq ON j.cluster_id = mq.cluster_id
                      AND j.quality_decile = mq.rep_quality
        GROUP BY mq.cluster_id, mq.n_members, mq.rep_quality
    """,
)
def cluster_best_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    sh = dedup.char_shingles_multiset(documents, k=SHINGLE_K)
    sh = sh.persist()
    sig = dedup.minhash_signatures(sh, n_hashes=N_HASHES)
    cand = dedup.minhash_band_candidates(
        sig, n_hashes=N_HASHES, band_size=BAND_SIZE
    )
    pairs = dedup.jaccard_pairs(sh, candidates=cand, threshold=0.5).select(
        "a_id", "b_id"
    )
    cc = dedup.connected_components(pairs)
    cmap = (
        documents.select("doc_id")
        .join(cc.select("doc_id", "cluster_id"), on="doc_id", how="left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    scored = text.quality_score(documents).select("doc_id", "quality_decile")
    j = cmap.join(scored, on="doc_id")
    j = j.persist()  # feeds the max-quality agg AND the rep pick
    # alias the aggregate side's columns so the shared-lineage join is
    # unambiguous (the suite's recall-eval convention — don't rely on
    # Spark's ambiguous-self-join rewrite)
    mq = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max("quality_decile").alias("rep_quality"),
    ).select(
        F.col("cluster_id").alias("_mq_cid"), "n_members", "rep_quality"
    )
    return (
        j.join(
            mq,
            on=(F.col("cluster_id") == F.col("_mq_cid"))
            & (F.col("quality_decile") == F.col("rep_quality")),
        )
        .groupBy("_mq_cid", "n_members", "rep_quality")
        .agg(F.min("doc_id").alias("rep_doc"))
        .select(
            F.col("_mq_cid").alias("cluster_id"),
            "n_members",
            "rep_doc",
            "rep_quality",
        )
    )


@register(
    "mixture_epoch_plan",
    op_ids="beyond-reference epoch-aware mixture planning (the Dolma/"
    "LLaMA data-recipe math: full passes + a fractional hash-sampled "
    "remainder per group under a token budget, repeats capped; one "
    "map-side-combined aggregate + broadcast share table, exact "
    "integer arithmetic)",
    description="per-language plan to hit a uniform 20% mix within a "
    "100k-token budget, at most 3 epochs per language: available and "
    "wanted tokens, full epochs, the fractional-pass sampling rate, "
    "achieved tokens after the cap",
    oracle="""
        WITH toks AS (
            SELECT lang,
                   len(list_filter(string_split(text, ' '), x -> x <> '')) AS nt
            FROM documents
        ),
        avail AS (
            SELECT lang, CAST(SUM(nt) AS BIGINT) AS avail_tokens
            FROM toks GROUP BY lang HAVING SUM(nt) > 0
        ),
        shares(lang, ppm) AS (
            VALUES ('en', 200000), ('de', 200000), ('fr', 200000),
                   ('es', 200000), ('zh', 200000)
        ),
        plan AS (
            SELECT a.lang, avail_tokens,
                   CAST((CAST(100000 AS BIGINT) * ppm) // 1000000 AS BIGINT) AS want_tokens
            FROM avail a JOIN shares s USING (lang)
        )
        SELECT lang, avail_tokens, want_tokens,
               CAST(LEAST(want_tokens, 3 * avail_tokens) AS BIGINT)
                   AS achieved_tokens,
               CAST(LEAST(want_tokens, 3 * avail_tokens) // avail_tokens
                    AS INT) AS full_epochs,
               round((LEAST(want_tokens, 3 * avail_tokens) % avail_tokens)
                     / CAST(avail_tokens AS DOUBLE), 6) + 0.0 AS partial_rate
        FROM plan
    """,
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    weighted = documents.select(
        "lang", F.size(text._ws_tokens("text")).alias("n_tokens")
    )
    return sampling.mixture_epoch_plan(
        weighted,
        "lang",
        "n_tokens",
        budget=100_000,
        shares={k: 0.2 for k in ("en", "de", "fr", "es", "zh")},
        max_epochs=3,
    )


# shared oracle CTE chain: the hashed-linear classifier's predicted
# quality_score (pred) and the heuristic-gate label (labels) — used
# verbatim by classifier_calibration_bins AND classifier_auc_eval so
# the two evals provably score the same model against the same labels
_HLQ_EVAL_CTES = f"""toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM documents
        ),
        b AS (
            SELECT doc_id,
                   {_hex_int_sql("md5('hlq-v1|' || tok)", 4)} % 256 AS bucket
            FROM toks
        ),
        w AS (
            SELECT doc_id,
                   CAST(round(CAST({_hex_int_sql("md5('hlq-v1|w|' || CAST(bucket AS VARCHAR))", 6)} AS DOUBLE)
                              / 16777216.0 * 2 - 1, 6) AS DECIMAL(12,6)) AS w
            FROM b
        ),
        agg AS (
            SELECT doc_id, SUM(w) AS sw, COUNT(*) AS n_tokens
            FROM w GROUP BY doc_id
        ),
        m AS (
            SELECT d.doc_id,
                   round(COALESCE(CAST(a.sw AS DOUBLE) / a.n_tokens, 0.0), 9) AS margin
            FROM documents d LEFT JOIN agg a USING (doc_id)
        ),
        pred AS (
            SELECT doc_id,
                   round(1.0 / (1.0 + exp(-margin)), 6) + 0.0 AS quality_score
            FROM m
        ),
        feats AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens,
                   length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
                   len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> list_contains(['the','a','of','and','is'], lower(x)))) AS n_stop,
                   COALESCE(list_sum(list_transform(
                       list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
                       x -> length(x))), 0) AS sum_tok_len
            FROM documents
        ),
        labels AS (
            SELECT doc_id,
                   (CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 4 ELSE 0 END
                    + CASE WHEN n_punct * 10 < n_chars THEN 2 ELSE 0 END
                    + CASE WHEN n_stop > 0 THEN 2 ELSE 0 END
                    + CASE WHEN sum_tok_len >= 3 * n_tokens
                            AND sum_tok_len <= 10 * n_tokens
                           THEN 2 ELSE 0 END) >= 6 AS is_good
            FROM feats
        )"""


@register(
    "classifier_calibration_bins",
    op_ids="beyond-reference model evaluation: calibration/reliability "
    "bins of the quality classifier against the heuristic gate "
    "(predicted-score deciles vs empirical positive rate — the "
    "is-the-score-a-probability check before thresholding a corpus "
    "on it); two keyed aggregates, decimal-exact mean score",
    description="10 equal-width score bins: row count, decimal-exact "
    "mean predicted quality score, and the empirical rate of "
    "heuristically-good documents (quality_decile >= 6) per bin",
    oracle=f"""
        WITH {_HLQ_EVAL_CTES}
        SELECT CAST(LEAST(CAST(floor(quality_score * 10) AS BIGINT), 9)
                    AS INT) AS score_bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(quality_score AS DECIMAL(12,6))) AS DOUBLE)
                   / COUNT(*) AS mean_score,
               CAST(SUM(CASE WHEN is_good THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_good,
               CAST(SUM(CASE WHEN is_good THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS pos_rate
        FROM pred JOIN labels USING (doc_id)
        GROUP BY 1
    """,
)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    pred = text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    ).select("doc_id", "quality_score")
    labels = text.quality_score(documents).select(
        "doc_id", (F.col("quality_decile") >= 6).alias("is_good")
    )
    joined = pred.join(labels, on="doc_id")
    bin_col = F.least(
        F.floor(F.col("quality_score") * 10).cast("long"), F.lit(9)
    ).cast("int")
    return joined.groupBy(bin_col.alias("score_bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(F.col("quality_score").cast("decimal(12,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_score"),
        F.sum(F.col("is_good").cast("long")).cast("long").alias("n_good"),
        (
            F.sum(F.col("is_good").cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("pos_rate"),
    )


@register(
    "classifier_ece_eval",
    op_ids="beyond-reference scalar calibration scorecard: "
    "reliability-weighted Expected Calibration Error + Maximum "
    "Calibration Error + Brier score of the quality classifier "
    "against the heuristic gate (VERDICT r8 item 8) — micro-unit "
    "integer sufficient statistics (grouped_rank_auc grain), "
    "DECIMAL(38,0) accumulators, the 10-term ECE sum folded in bin "
    "order on both engines (the DCG ordered-fold recipe)",
    description="one-row calibration scorecard: N, ECE (bin-weighted "
    "|accuracy - confidence|), MCE (max bin deviation), Brier score "
    "— the is-the-score-usable-as-a-probability gate before "
    "thresholding a corpus on it",
    oracle=f"""
        WITH {_HLQ_EVAL_CTES},
        ecej AS (
            SELECT p.quality_score AS s,
                   CAST(round(p.quality_score * 1000000) AS BIGINT) AS pi,
                   CASE WHEN l.is_good THEN 1 ELSE 0 END AS y
            FROM pred p JOIN labels l USING (doc_id)
        ),
        eceb AS (
            SELECT LEAST(CAST(floor(s * 10) AS BIGINT), 9) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS nb,
                   SUM(CAST(pi AS HUGEINT)) AS spi,
                   CAST(SUM(y) AS BIGINT) AS ng
            FROM ecej GROUP BY 1
        ),
        ecet AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   SUM(CAST(pi - y * 1000000 AS HUGEINT)
                       * (pi - y * 1000000)) AS ssq
            FROM ecej
        ),
        eceterms AS (
            SELECT bin,
                   abs(CAST(ng AS DOUBLE) / CAST(nb AS DOUBLE)
                       - CAST(spi AS DOUBLE)
                         / (CAST(nb AS DOUBLE) * 1000000.0)) AS dev,
                   CAST(nb AS DOUBLE) / CAST(ecet.n_docs AS DOUBLE) AS w,
                   ecet.n_docs AS n_docs, ecet.ssq AS ssq
            FROM eceb, ecet
        )
        SELECT n_docs,
               SUM(w * dev ORDER BY bin) AS ece,
               MAX(dev) AS mce,
               CAST(ssq AS DOUBLE)
                   / (CAST(n_docs AS DOUBLE) * 1000000000000.0) AS brier
        FROM eceterms GROUP BY n_docs, ssq
    """,
)
def classifier_ece_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import (
        expected_calibration_error,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pred = text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    ).select("doc_id", "quality_score")
    labels = text.quality_score(documents).select(
        "doc_id", (F.col("quality_decile") >= 6).alias("is_good")
    )
    joined = pred.join(labels, on="doc_id")
    return expected_calibration_error(
        joined, "quality_score", "is_good", n_bins=10, scale=1_000_000
    )


@register(
    "youden_threshold_select",
    op_ids="beyond-reference operating-point selection: Youden's J "
    "(TPR - FPR) maximized ALL-INTEGER (J*P*N = tp*N - fp*P, argmax "
    "can never flip on a double ulp) over descending score cells — "
    "the deploy-threshold step after rank_auc/average_precision "
    "grade the ranking; lowest-threshold tie-break",
    description="one-row threshold pick for the quality classifier: "
    "class counts, optimal threshold, J statistic, and TPR/FPR at "
    "the optimum",
    oracle=f"""
        WITH {_HLQ_EVAL_CTES},
        yj AS (
            SELECT CAST(round(p.quality_score * 1000000) AS BIGINT) AS c,
                   CASE WHEN l.is_good THEN 1 ELSE 0 END AS y
            FROM pred p JOIN labels l USING (doc_id)
        ),
        yh AS (
            SELECT c, CAST(SUM(y) AS BIGINT) AS n1v,
                   CAST(COUNT(*) AS BIGINT) AS nv
            FROM yj GROUP BY 1
        ),
        yc AS (
            SELECT c,
                   SUM(n1v) OVER (ORDER BY c DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS tp,
                   SUM(nv - n1v) OVER (ORDER BY c DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS fp
            FROM yh
        ),
        yt AS (
            SELECT CAST(SUM(n1v) AS BIGINT) AS n_pos,
                   CAST(SUM(nv - n1v) AS BIGINT) AS n_neg
            FROM yh
        ),
        ys AS (
            SELECT c, tp, fp, n_pos, n_neg,
                   CAST(tp * n_neg - fp * n_pos AS BIGINT) AS jint
            FROM yc CROSS JOIN yt
        ),
        yb AS (
            SELECT n_pos, n_neg, MAX(jint) AS jbest FROM ys GROUP BY 1, 2
        )
        SELECT s.n_pos, s.n_neg,
               CAST(MIN(s.c) AS DOUBLE) / 1000000.0 AS threshold,
               CASE WHEN s.n_pos = 0 OR s.n_neg = 0
                    THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(b.jbest AS DOUBLE)
                         / (CAST(s.n_pos AS DOUBLE)
                            * CAST(s.n_neg AS DOUBLE)) END AS j_stat,
               CASE WHEN s.n_pos = 0 THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(min_by(s.tp, s.c) AS DOUBLE)
                         / CAST(s.n_pos AS DOUBLE) END AS tpr,
               CASE WHEN s.n_neg = 0 THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(min_by(s.fp, s.c) AS DOUBLE)
                         / CAST(s.n_neg AS DOUBLE) END AS fpr
        FROM ys s JOIN yb b
          ON s.n_pos = b.n_pos AND s.n_neg = b.n_neg
             AND s.jint = b.jbest
        GROUP BY s.n_pos, s.n_neg, b.jbest
    """,
)
def youden_threshold_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import youden_j_threshold

    (documents,) = load(spark, sf_dir, "documents")
    pred = text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    ).select("doc_id", "quality_score")
    labels = text.quality_score(documents).select(
        "doc_id", (F.col("quality_decile") >= 6).alias("is_good")
    )
    joined = pred.join(labels, on="doc_id")
    return youden_j_threshold(
        joined, "quality_score", F.col("is_good"), scale=1_000_000
    )


@register(
    "classifier_pr_auc_eval",
    op_ids="beyond-reference imbalance-honest model evaluation: exact "
    "average precision (step-wise PR-AUC) of the quality classifier "
    "— cumulative TP/FP over descending score CELLS (the rank_auc "
    "bounded-grain contract), each cell's recall-gain x precision "
    "term rounded 12dp and summed as DECIMAL (the km_survival "
    "round-then-sum recipe: order-free, engine-stable over up to a "
    "million cells)",
    description="one-row PR scorecard: positive/negative counts and "
    "exact average precision — the operating-point metric for corpus "
    "filtering where ROC-AUC hides negative-dominated imbalance",
    oracle=f"""
        WITH {_HLQ_EVAL_CTES},
        apj AS (
            SELECT CAST(round(p.quality_score * 1000000) AS BIGINT) AS c,
                   CASE WHEN l.is_good THEN 1 ELSE 0 END AS y
            FROM pred p JOIN labels l USING (doc_id)
        ),
        aph AS (
            SELECT c, CAST(SUM(y) AS BIGINT) AS n1v,
                   CAST(COUNT(*) AS BIGINT) AS nv
            FROM apj GROUP BY 1
        ),
        apc AS (
            SELECT c, n1v,
                   SUM(n1v) OVER (ORDER BY c DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS tp,
                   SUM(nv - n1v) OVER (ORDER BY c DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS fp
            FROM aph
        ),
        apt AS (
            SELECT CAST(SUM(n1v) AS BIGINT) AS n_pos,
                   CAST(SUM(nv - n1v) AS BIGINT) AS n_neg
            FROM aph
        ),
        apterms AS (
            SELECT n_pos, n_neg,
                   CAST(round(CAST(n1v AS DOUBLE) / CAST(n_pos AS DOUBLE)
                        * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)),
                        12) AS DECIMAL(28,12)) AS term
            FROM apc CROSS JOIN apt WHERE n1v > 0
        ),
        apsum AS (
            SELECT n_pos, n_neg, CAST(SUM(term) AS DECIMAL(38,12)) AS ap_dec
            FROM apterms GROUP BY 1, 2
        )
        SELECT t.n_pos, t.n_neg,
               CASE WHEN t.n_pos = 0 OR t.n_neg = 0
                    THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(ap_dec AS DOUBLE) END AS avg_precision
        FROM apt t LEFT JOIN apsum USING (n_pos, n_neg)
    """,
)
def classifier_pr_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import average_precision

    (documents,) = load(spark, sf_dir, "documents")
    pred = text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    ).select("doc_id", "quality_score")
    labels = text.quality_score(documents).select(
        "doc_id", (F.col("quality_decile") >= 6).alias("is_good")
    )
    joined = pred.join(labels, on="doc_id")
    return average_precision(
        joined, "quality_score", F.col("is_good"), scale=1_000_000
    )


@register(
    "classifier_corpus_gate",
    op_ids="beyond-reference end-to-end model-based corpus gating "
    "(VERDICT r11 item 5 — the missing link from 'classifier exists' "
    "to 'classifier gates the corpus'): hashed-linear scores -> "
    "Youden operating point -> per-source kept/dropped doc and token "
    "mass; the gate is a per-row integer compare against ONE "
    "broadcast threshold cell, no shuffle before the source-keyed "
    "aggregate",
    description="per source: documents and token mass surviving the "
    "quality classifier at its Youden-selected threshold — the "
    "which-sources-lose-how-much table read before enabling a "
    "model-based filter",
    oracle=f"""
        WITH {_HLQ_EVAL_CTES},
        yj AS (
            SELECT CAST(round(p.quality_score * 1000000) AS BIGINT) AS c,
                   CASE WHEN l.is_good THEN 1 ELSE 0 END AS y
            FROM pred p JOIN labels l USING (doc_id)
        ),
        yh AS (
            SELECT c, CAST(SUM(y) AS BIGINT) AS n1v,
                   CAST(COUNT(*) AS BIGINT) AS nv
            FROM yj GROUP BY 1
        ),
        yc AS (
            SELECT c,
                   SUM(n1v) OVER (ORDER BY c DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS tp,
                   SUM(nv - n1v) OVER (ORDER BY c DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS fp
            FROM yh
        ),
        yt AS (
            SELECT CAST(SUM(n1v) AS BIGINT) AS n_pos,
                   CAST(SUM(nv - n1v) AS BIGINT) AS n_neg
            FROM yh
        ),
        ys AS (
            SELECT c, CAST(tp * n_neg - fp * n_pos AS BIGINT) AS jint
            FROM yc CROSS JOIN yt
        ),
        thr AS (
            SELECT CASE WHEN (SELECT n_pos FROM yt) = 0
                          OR (SELECT n_neg FROM yt) = 0
                        THEN CAST(NULL AS BIGINT)
                        ELSE (SELECT MIN(c) FROM ys
                              WHERE jint = (SELECT MAX(jint) FROM ys))
                   END AS thr_c
        ),
        scored AS (
            SELECT d.source,
                   COALESCE(a.n_tokens, 0) AS w,
                   CAST(round(p.quality_score * 1000000) AS BIGINT) AS c
            FROM documents d
            JOIN pred p USING (doc_id)
            LEFT JOIN agg a USING (doc_id)
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN t.thr_c IS NULL OR c >= t.thr_c
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(w) AS BIGINT) AS weight_total,
               CAST(SUM(CASE WHEN t.thr_c IS NULL OR c >= t.thr_c
                             THEN w ELSE 0 END) AS BIGINT) AS weight_kept,
               CAST(SUM(CASE WHEN t.thr_c IS NULL OR c >= t.thr_c
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS kept_frac
        FROM scored CROSS JOIN thr t
        GROUP BY source
    """,
)
def classifier_corpus_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import (
        classifier_gate_report,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pred = text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    ).select("doc_id", "n_tokens", "quality_score")
    labels = text.quality_score(documents).select(
        "doc_id", (F.col("quality_decile") >= 6).alias("is_good")
    )
    joined = (
        pred.join(labels, on="doc_id")
        .join(documents.select("doc_id", "source"), on="doc_id")
    )
    return classifier_gate_report(
        joined,
        "quality_score",
        F.col("is_good"),
        "source",
        weight_col="n_tokens",
        scale=1_000_000,
    )


@register(
    "brier_murphy_decomposition",
    op_ids="beyond-reference calibration diagnostics: Murphy "
    "decomposition of the quality classifier's Brier score into "
    "reliability (miscalibration), resolution (discrimination) and "
    "uncertainty (label noise floor) over the same micro-unit "
    "integer sufficient statistics as classifier_ece_eval; both "
    "10-term sums fold in bin order (the DCG ordered-fold recipe)",
    description="one-row Murphy scorecard: N, reliability, resolution, "
    "uncertainty, exact Brier — says WHY the classifier's "
    "probabilities are off (badly calibrated vs simply "
    "non-discriminative) before a corpus is thresholded on them",
    oracle=f"""
        WITH {_HLQ_EVAL_CTES},
        mdj AS (
            SELECT p.quality_score AS s,
                   CAST(round(p.quality_score * 1000000) AS BIGINT) AS pi,
                   CASE WHEN l.is_good THEN 1 ELSE 0 END AS y
            FROM pred p JOIN labels l USING (doc_id)
        ),
        mdb AS (
            SELECT LEAST(CAST(floor(s * 10) AS BIGINT), 9) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS nb,
                   SUM(CAST(pi AS HUGEINT)) AS spi,
                   CAST(SUM(y) AS BIGINT) AS ng
            FROM mdj GROUP BY 1
        ),
        mdt AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(y) AS BIGINT) AS n_pos,
                   SUM(CAST(pi - y * 1000000 AS HUGEINT)
                       * (pi - y * 1000000)) AS ssq
            FROM mdj
        ),
        mterms AS (
            SELECT bin,
                   CAST(nb AS DOUBLE) / CAST(n_docs AS DOUBLE) AS w,
                   CAST(ng AS DOUBLE) / CAST(nb AS DOUBLE)
                       - CAST(spi AS DOUBLE)
                         / (CAST(nb AS DOUBLE) * 1000000.0) AS dra,
                   CAST(ng AS DOUBLE) / CAST(nb AS DOUBLE)
                       - CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE) AS drs,
                   mdt.n_docs AS n_docs, mdt.n_pos AS n_pos, mdt.ssq AS ssq
            FROM mdb, mdt
        )
        SELECT n_docs,
               SUM(w * dra * dra ORDER BY bin) AS reliability,
               SUM(w * drs * drs ORDER BY bin) AS resolution,
               CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE)
                   * (1.0 - CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE))
                   AS uncertainty,
               CAST(ssq AS DOUBLE)
                   / (CAST(n_docs AS DOUBLE) * 1000000000000.0) AS brier
        FROM mterms GROUP BY n_docs, n_pos, ssq
    """,
)
def brier_murphy_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import murphy_decomposition

    (documents,) = load(spark, sf_dir, "documents")
    pred = text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    ).select("doc_id", "quality_score")
    labels = text.quality_score(documents).select(
        "doc_id", (F.col("quality_decile") >= 6).alias("is_good")
    )
    joined = pred.join(labels, on="doc_id")
    return murphy_decomposition(
        joined, "quality_score", "is_good", n_bins=10, scale=1_000_000
    )


@register(
    "isotonic_calibration_map",
    op_ids="beyond-reference isotonic (PAV) calibration map of the "
    "quality classifier over score-decile bins — the "
    "pool-adjacent-violators fit computed NON-iteratively via the "
    "minimax identity iso_i = max_{j<=i} min_{k>=i} avg(j..k): "
    "interval averages from prefix sums over <= 10 histogram rows, "
    "the (j,k) grid and the per-bin minimax are bounded broadcast "
    "grids (the benford class), every average ONE double division of "
    "exact integer sums — bit-identical cross-engine, monotone by "
    "construction",
    description="per-bin isotonic calibration map: raw positive rate "
    "vs the PAV monotone fit — the calibrated-probability table a "
    "scorer applies before corpus thresholding (pairs with "
    "classifier_ece_eval's scorecard)",
    oracle=f"""
        WITH {_HLQ_EVAL_CTES},
        isoj AS (
            SELECT LEAST(CAST(floor(p.quality_score * 10) AS BIGINT), 9)
                       AS bin,
                   CASE WHEN l.is_good THEN 1 ELSE 0 END AS y
            FROM pred p JOIN labels l USING (doc_id)
        ),
        isob AS (
            SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
                   CAST(SUM(y) AS BIGINT) AS ng
            FROM isoj GROUP BY 1
        ),
        isoc AS (
            SELECT bin, nb, ng,
                   SUM(nb) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cnb,
                   SUM(ng) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cng
            FROM isob
        ),
        ivl AS (
            SELECT jj.bin AS j, kk.bin AS k,
                   CAST(kk.cng - (jj.cng - jj.ng) AS DOUBLE)
                       / CAST(kk.cnb - (jj.cnb - jj.nb) AS DOUBLE) AS avgv
            FROM isoc jj JOIN isoc kk ON jj.bin <= kk.bin
        ),
        mins AS (
            SELECT b.bin AS i, v.j, MIN(v.avgv) AS mn
            FROM isob b JOIN ivl v ON v.j <= b.bin AND v.k >= b.bin
            GROUP BY 1, 2
        ),
        iso AS (SELECT i AS bin, MAX(mn) AS iso_rate FROM mins GROUP BY 1)
        SELECT b.bin, b.nb, b.ng,
               CAST(b.ng AS DOUBLE) / CAST(b.nb AS DOUBLE) AS raw_rate,
               iso.iso_rate
        FROM isob b JOIN iso USING (bin)
    """,
)
def isotonic_calibration_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import (
        isotonic_calibration_bins,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pred = text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    ).select("doc_id", "quality_score")
    labels = text.quality_score(documents).select(
        "doc_id", (F.col("quality_decile") >= 6).alias("is_good")
    )
    joined = pred.join(labels, on="doc_id")
    return isotonic_calibration_bins(
        joined, "quality_score", "is_good", n_bins=10
    )


@register(
    "isotonic_calibration_by_lang",
    op_ids="beyond-reference SLICED isotonic (PAV) calibration: one "
    "monotone fit per language — grouped_isotonic_calibration_bins "
    "keys EVERY stage by the slice (prefix-sum windows partitioned, "
    "the (j,k) interval grid and the minimax join carry the slice "
    "key), so the bounded grids stay per-slice and there is NO "
    "unpartitioned stage at all (the grouped_cusum_peak doctrine); "
    "every interval average one double division of exact integers",
    description="per-language isotonic calibration maps of the "
    "quality classifier: raw positive rate vs the PAV monotone fit "
    "per score bin — the per-slice calibration table that catches a "
    "classifier that is well-calibrated globally but biased on one "
    "language",
    oracle=f"""
        WITH {_HLQ_EVAL_CTES},
        gj AS (
            SELECT d.lang AS g,
                   LEAST(CAST(floor(p.quality_score * 10) AS BIGINT), 9)
                       AS bin,
                   CASE WHEN l.is_good THEN 1 ELSE 0 END AS y
            FROM pred p
            JOIN labels l USING (doc_id)
            JOIN documents d USING (doc_id)
        ),
        gb AS (
            SELECT g, bin, CAST(COUNT(*) AS BIGINT) AS nb,
                   CAST(SUM(y) AS BIGINT) AS ng
            FROM gj GROUP BY 1, 2
        ),
        gc AS (
            SELECT g, bin, nb, ng,
                   SUM(nb) OVER (PARTITION BY g ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cnb,
                   SUM(ng) OVER (PARTITION BY g ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cng
            FROM gb
        ),
        ivl AS (
            SELECT jj.g, jj.j, kk.k,
                   CAST(kk.kng - jj.lng AS DOUBLE)
                       / CAST(kk.knb - jj.lnb AS DOUBLE) AS avgv
            FROM (SELECT g, bin AS j, cnb - nb AS lnb, cng - ng AS lng
                  FROM gc) jj
            JOIN (SELECT g, bin AS k, cnb AS knb, cng AS kng FROM gc) kk
              ON jj.g = kk.g AND jj.j <= kk.k
        ),
        mins AS (
            SELECT b.g, b.bin AS i, v.j, MIN(v.avgv) AS mn
            FROM gb b JOIN ivl v
              ON b.g = v.g AND v.j <= b.bin AND v.k >= b.bin
            GROUP BY 1, 2, 3
        ),
        iso AS (SELECT g, i, MAX(mn) AS iso_rate FROM mins GROUP BY 1, 2)
        SELECT b.g AS lang, b.bin, b.nb, b.ng,
               CAST(b.ng AS DOUBLE) / CAST(b.nb AS DOUBLE) AS raw_rate,
               iso.iso_rate
        FROM gb b JOIN iso ON b.g = iso.g AND b.bin = iso.i
    """,
)
def isotonic_calibration_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import (
        grouped_isotonic_calibration_bins,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pred = text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    ).select("doc_id", "quality_score")
    labels = text.quality_score(documents).select(
        "doc_id", (F.col("quality_decile") >= 6).alias("is_good")
    )
    joined = pred.join(labels, on="doc_id").join(
        documents.select("doc_id", "lang"), on="doc_id"
    )
    return grouped_isotonic_calibration_bins(
        joined, "lang", "quality_score", "is_good", n_bins=10
    )


@register(
    "lang_id_mcc",
    op_ids="beyond-reference model evaluation: multiclass Matthews "
    "correlation (the R_K statistic) of the language-ID heuristic vs "
    "the gold lang column — chance-corrected like kappa but symmetric "
    "in the marginals and honest under class imbalance; all "
    "sufficient statistics exact integers in DECIMAL(38,0) (s^2 "
    "passes 2^63 at warehouse scale), ONE fixed-order double at the "
    "edge, explicit NULL on constant marginals",
    description="one-row multiclass MCC scorecard of lang-ID vs gold "
    "labels: doc total, correct count, MCC — pairs with "
    "lang_id_cohens_kappa and lang_id_macro_f1 on the same confusion "
    "relation",
    oracle=f"""
        WITH preds AS ({_lang_id_oracle()}),
        mj AS (
            SELECT d.lang AS t, p.pred_lang AS p
            FROM documents d JOIN preds p USING (doc_id)
        ),
        mcells AS (
            SELECT t, p, CAST(COUNT(*) AS BIGINT) AS n
            FROM mj GROUP BY 1, 2
        ),
        mtk AS (SELECT t AS cls, CAST(SUM(n) AS HUGEINT) AS tkn
                FROM mcells GROUP BY 1),
        mpk AS (SELECT p AS cls, CAST(SUM(n) AS HUGEINT) AS pkn
                FROM mcells GROUP BY 1),
        mmarg AS (
            SELECT CAST(SUM(COALESCE(pkn, 0) * COALESCE(tkn, 0)) AS HUGEINT)
                       AS spt,
                   CAST(SUM(COALESCE(pkn, 0) * COALESCE(pkn, 0)) AS HUGEINT)
                       AS spp,
                   CAST(SUM(COALESCE(tkn, 0) * COALESCE(tkn, 0)) AS HUGEINT)
                       AS stt
            FROM mtk FULL OUTER JOIN mpk USING (cls)
        ),
        mbase AS (
            SELECT CAST(SUM(n) AS BIGINT) AS s,
                   CAST(SUM(CASE WHEN t = p THEN n ELSE 0 END) AS BIGINT)
                       AS c
            FROM mcells
        )
        SELECT s AS n_total, c AS n_correct,
               CASE WHEN CAST(s AS HUGEINT) * s - spp = 0
                         OR CAST(s AS HUGEINT) * s - stt = 0
                    THEN CAST(NULL AS DOUBLE)
                    ELSE (CAST(c AS DOUBLE) * CAST(s AS DOUBLE)
                          - CAST(spt AS DOUBLE))
                         / (sqrt(CAST(CAST(s AS HUGEINT) * s - spp
                                      AS DOUBLE))
                            * sqrt(CAST(CAST(s AS HUGEINT) * s - stt
                                        AS DOUBLE)))
               END AS mcc
        FROM mbase CROSS JOIN mmarg
    """,
)
def lang_id_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import multiclass_mcc

    (documents,) = load(spark, sf_dir, "documents")
    preds = text.lang_id(documents).select("doc_id", "pred_lang")
    joined = documents.select("doc_id", F.col("lang").alias("true_lang")).join(
        preds, on="doc_id"
    )
    return multiclass_mcc(joined, "true_lang", "pred_lang")


@register(
    "text_nfc_normalization",
    op_ids="beyond-reference Unicode NFC normalization (the canonical-"
    "composition pass before hashing/dedup/tokenization; Arrow scalar "
    "pandas UDF over stdlib unicodedata, narrow, no shuffle — "
    "cross-engine exact because NFC is a Unicode-standard fixpoint)",
    description="documents NFC-normalized with a changed flag — "
    "composed/decomposed variants of identical-rendering text would "
    "otherwise defeat exact dedup and skew token counts",
    oracle="""
        SELECT doc_id,
               nfc_normalize(text) AS norm_text,
               nfc_normalize(text) <> text AS changed
        FROM documents
    """,
)
def text_nfc_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.nfc_normalize(documents)


@register(
    "fim_split_documents",
    op_ids="beyond-reference fill-in-the-middle transform "
    "(operators/text.py:fim_split): content-hash cut points -> "
    "(prefix, middle, suffix) + PSM rendering; deterministic across "
    "engines/partitionings, no RNG, narrow projection (no shuffle, "
    "no UDF)",
    description="deterministic FIM (prefix/suffix/middle) split of "
    "each document with the PSM training rendering",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN length(text) >= 20 THEN 'fim' ELSE 'plain' END AS mode,
               CASE WHEN length(text) >= 20
                    THEN substring(text, 1, CAST(c1 AS INT))
                    ELSE text END AS prefix,
               CASE WHEN length(text) >= 20
                    THEN substring(text, CAST(c1 + 1 AS INT), CAST(c2 - c1 AS INT))
                    ELSE '' END AS middle,
               CASE WHEN length(text) >= 20
                    THEN substring(text, CAST(c2 + 1 AS INT),
                                   CAST(length(text) - c2 AS INT))
                    ELSE '' END AS suffix,
               '<PRE>' ||
               CASE WHEN length(text) >= 20
                    THEN substring(text, 1, CAST(c1 AS INT)) ELSE text END ||
               '<SUF>' ||
               CASE WHEN length(text) >= 20
                    THEN substring(text, CAST(c2 + 1 AS INT),
                                   CAST(length(text) - c2 AS INT))
                    ELSE '' END ||
               '<MID>' ||
               CASE WHEN length(text) >= 20
                    THEN substring(text, CAST(c1 + 1 AS INT), CAST(c2 - c1 AS INT))
                    ELSE '' END AS psm
        FROM (
            SELECT doc_id, text,
                   LEAST(a, b) AS c1, GREATEST(a, b) AS c2
            FROM (
                SELECT doc_id, text,
                       {_hex_int_sql("md5(text)", 8)} % (length(text) + 1) AS a,
                       {_hex_int_sql("substring(md5(text), 9, 8)", 8)} % (length(text) + 1) AS b
                FROM documents
            )
        )
    """,
)
def fim_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return text.fim_split(documents, min_len=20)


@register(
    "length_bucket_padding",
    op_ids="beyond-reference batching-efficiency report "
    "(operators/packing.py:length_bucket_padding_stats): power-of-two "
    "length buckets via integer bit arithmetic (1 << length(bin(w-1)), "
    "never FP ceil(log2)); per-bucket pad-token waste for "
    "pad-to-bucket-top batch samplers",
    description="per power-of-two length bucket: doc count, token "
    "sum, pad tokens and pad fraction under bucketed batching",
    oracle="""
        WITH b AS (
            SELECT CASE WHEN n_chars <= 1 THEN CAST(1 AS BIGINT)
                        ELSE CAST(1 AS BIGINT) << length(bin(n_chars - 1))
                   END AS bucket_top,
                   n_chars
            FROM documents
        ),
        agg AS (
            SELECT bucket_top,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_tokens
            FROM b GROUP BY bucket_top
        )
        SELECT bucket_top, n_docs, sum_tokens,
               n_docs * bucket_top - sum_tokens AS pad_tokens,
               CAST(n_docs * bucket_top - sum_tokens AS DOUBLE)
               / CAST(n_docs * bucket_top AS DOUBLE) AS pad_fraction
        FROM agg
    """,
)
def length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.packing import (
        length_bucket_padding_stats,
    )

    (documents,) = load(spark, sf_dir, "documents")
    return length_bucket_padding_stats(documents, weight_col="n_chars")


# ---------------------------------------------------------------------------
# round-7 additions: membership pre-filter + cheap-LM quality scoring
# ---------------------------------------------------------------------------


@register(
    "bloom_membership_prefilter",
    op_ids="beyond-reference approximate-membership pre-filter: a "
    "deterministic Bloom filter materialized as a (word, bits) bitmap "
    "RELATION (bit_or aggregate; md5-window hashing, no RNG) probed "
    "by the incoming batch before the exact batch-vs-history "
    "anti-join — the lakehouse short-circuit that lets "
    "definitely-new rows skip the full-history shuffle. OSS Spark's "
    "internal bloom_filter_agg/might_contain pair is not "
    "SQL-registrable in 4.1 and its bit layout is engine-private; "
    "this relation form is engine-portable, so the oracle reproduces "
    "the filter bit for bit — including its false positives",
    description="history docs (doc_id%3!=0) build a 4096-bit k=3 "
    "Bloom bitmap over md5(text); the probe batch (doc_id%3==0) is "
    "classified maybe-seen/definitely-new; exact fingerprint truth "
    "yields the false-positive count and pins the zero-false-negative "
    "contract — every number exact cross-engine because the hash "
    "positions are md5-derived, not RNG-derived",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id, md5(text) AS fp, doc_id % 3 = 0 AS is_probe
            FROM documents
        ),
        hist AS (SELECT DISTINCT fp FROM fp WHERE NOT is_probe),
        hpos AS (
            SELECT {_hex_int_sql("substring(fp, 1 + 8*i, 8)", 8)} % 4096 AS pos
            FROM hist, (SELECT unnest(generate_series(0, 2)) AS i)
        ),
        bloom AS (
            SELECT pos // 64 AS word,
                   bit_or(CAST(1 AS UBIGINT) << CAST(pos % 64 AS INTEGER))
                       AS bits
            FROM hpos GROUP BY 1
        ),
        ppos AS (
            SELECT doc_id,
                   {_hex_int_sql("substring(fp, 1 + 8*i, 8)", 8)} % 4096 AS pos
            FROM fp, (SELECT unnest(generate_series(0, 2)) AS i)
            WHERE is_probe
        ),
        verdict AS (
            SELECT doc_id,
                   bool_and(bits IS NOT NULL AND (bits &
                       (CAST(1 AS UBIGINT) << CAST(pos % 64 AS INTEGER))) <> 0)
                       AS bloom_member
            FROM ppos LEFT JOIN bloom ON bloom.word = ppos.pos // 64
            GROUP BY doc_id
        ),
        truth AS (
            SELECT doc_id, fp IN (SELECT fp FROM hist) AS is_dup
            FROM fp WHERE is_probe
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
               CAST(SUM(CASE WHEN bloom_member THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bloom_member,
               CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_true_dups,
               CAST(SUM(CASE WHEN bloom_member AND NOT is_dup THEN 1 ELSE 0
                        END) AS BIGINT) AS n_false_positives,
               bool_and(NOT is_dup OR bloom_member) AS no_false_negatives
        FROM verdict JOIN truth USING (doc_id)
    """,
)
def bloom_membership_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4096-bit filter is deliberately small so the check scales
    exercise the false-positive path (a right-sized production filter
    uses m ~ 16n bits for ~3% FPR at k=3 and stays a relation —
    operators/membership.py docstring has the 2^33-bit sizing). The
    no_false_negatives boolean is structural (recorded keys always
    hit), so a True here plus an exact n_false_positives match means
    the oracle rebuilt the identical bitmap."""
    from nhl_data_warehouse_spark.operators import membership

    m_bits, k = 4096, 3
    (documents,) = load(spark, sf_dir, "documents")
    history = documents.where(F.col("doc_id") % 3 != 0)
    probe = documents.where(F.col("doc_id") % 3 == 0)
    bloom = membership.bloom_build(
        history.select("text"), "text", m_bits=m_bits, k=k
    )
    verdicts = membership.bloom_probe(
        probe, bloom, key_col="text", id_col="doc_id", m_bits=m_bits, k=k
    )
    hist_fp = history.select(F.md5("text").alias("fp")).distinct()
    truth = (
        probe.select("doc_id", F.md5("text").alias("fp"))
        .join(hist_fp.withColumn("__seen", F.lit(True)), on="fp", how="left")
        .select(
            "doc_id", F.coalesce("__seen", F.lit(False)).alias("is_dup")
        )
    )
    return verdicts.join(truth, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_probed"),
        F.sum(F.col("bloom_member").cast("long")).alias("n_bloom_member"),
        F.sum(F.col("is_dup").cast("long")).alias("n_true_dups"),
        F.sum((F.col("bloom_member") & ~F.col("is_dup")).cast("long")).alias(
            "n_false_positives"
        ),
        F.bool_and(~F.col("is_dup") | F.col("bloom_member")).alias(
            "no_false_negatives"
        ),
    )


@register(
    "approx_topk_heavy_hitters",
    op_ids="beyond-reference heavy-hitters sketch (Spark 4 "
    "approx_top_k — Space-Saving family), completing the sketch "
    "matrix alongside Count-Min, HLL and the KLL-style percentile "
    "sketch. Checked the tolerance-band way with an EXACTNESS-REGIME "
    "claim: Space-Saving with tracking capacity >= the distinct-item "
    "count is provably exact, so with maxItemsTracked=10000 over a "
    "sub-1000-bigram vocabulary every sketched count must equal the "
    "exact count and no strictly-dominant item may be missing — both "
    "engine-independent booleans; the exact scalars (distinct grams, "
    "max count, k-th count) hash-match directly",
    description="top-10 word-bigram heavy hitters via approx_top_k, "
    "emitted as exact corpus scalars plus two exactness-regime "
    "booleans (sketch counts == exact counts; every bigram strictly "
    "above the k-th count is in the sketch set)",
    oracle=f"""
        WITH {_DOCS_ARR_CTE},
        bi AS (
            SELECT array_to_string(list_slice(arr, i, i + 1), ' ') AS gram
            FROM docs, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i)
        ),
        c AS (SELECT gram, COUNT(*) AS c FROM bi GROUP BY 1),
        k AS (SELECT MIN(c) AS kth FROM (SELECT c FROM c ORDER BY c DESC LIMIT 10))
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_distinct_grams,
               (SELECT CAST(MAX(c) AS BIGINT) FROM c) AS max_count,
               (SELECT CAST(kth AS BIGINT) FROM k) AS kth_count,
               TRUE AS topk_counts_exact,
               TRUE AS topk_dominates
    """,
)
def approx_topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both arms share the persisted exact-count relation; the sketch
    runs once over the exploded grams. At corpus scale the production
    form keeps ONLY the sketch arm (one partial-aggregated pass, state
    = maxItemsTracked entries per partition merged once); the exact
    arm here is the eval's ground truth, same pattern as
    ``lsh_candidate_quality``."""
    from nhl_data_warehouse_spark.operators.text import _word_bigrams

    k_top = 10
    (documents,) = load(spark, sf_dir, "documents")
    grams = documents.select(F.explode(_word_bigrams("text")).alias("gram"))
    grams = grams.persist()
    grams.count()  # materialize before the sketch/exact fan-out
    sketch = (
        grams.agg(F.expr(f"approx_top_k(gram, {k_top}, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("gram"), F.col("e.count").alias("sk_count")
        )
    )
    exact = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    # four consumer subtrees (kth, scalars, counts_exact, dominates)
    # share one final job — materialize so they can't race the cache
    exact = exact.persist()
    exact.count()
    kth = (
        exact.orderBy(F.col("c").desc(), F.col("gram"))
        .limit(k_top)
        .agg(F.min("c").alias("kth"))
    )
    scalars = exact.agg(
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.max("c").alias("max_count"),
    ).crossJoin(kth.select(F.col("kth").alias("kth_count")))
    counts_exact = sketch.join(exact, on="gram", how="left").agg(
        # vacuously exact on an empty sketch (coalesce TRUE); the size
        # check compares against min(k_top, vocabulary) below, so an
        # undersized vocabulary doesn't flip the boolean (ADVICE r7)
        F.coalesce(
            F.bool_and(
                F.col("c").isNotNull() & (F.col("sk_count") == F.col("c"))
            ),
            F.lit(True),
        ).alias("ok"),
        F.count(F.lit(1)).alias("n_sk"),
    )
    dominates = (
        exact.crossJoin(F.broadcast(kth))
        .where(F.col("c") > F.col("kth"))
        .join(sketch.select("gram", F.lit(True).alias("__in_sk")), "gram", "left")
        .agg(
            # no gram strictly above the k-th count -> vacuously true
            # (bool_and over the empty set is NULL, not TRUE)
            F.coalesce(
                F.bool_and(F.col("__in_sk").isNotNull()), F.lit(True)
            ).alias("topk_dominates")
        )
    )
    return (
        scalars.crossJoin(F.broadcast(counts_exact))
        .crossJoin(F.broadcast(dominates))
        .select(
            "n_distinct_grams",
            "max_count",
            "kth_count",
            (
                F.col("ok")
                & (F.col("n_sk") == F.least(F.lit(k_top), F.col("n_distinct_grams")))
            ).alias("topk_counts_exact"),
            "topk_dominates",
        )
    )


@register(
    "classifier_auc_eval",
    op_ids="beyond-reference model evaluation: exact ROC AUC of the "
    "quality classifier against the heuristic gate via the "
    "Mann-Whitney identity (AUC = U1/(n_pos*n_neg), midrank ties) — "
    "the threshold-free companion to classifier_calibration_bins, "
    "sharing its pred/labels relations verbatim; all-integer rank "
    "sufficient statistics on the micro-score grain, AUC is one "
    "double division so the value is bit-stable cross-engine",
    description="ROC AUC (exact, tie-aware) of the hashed-linear "
    "quality score against the heuristic-quality label, plus the "
    "class sizes",
    oracle=f"""
        WITH {_HLQ_EVAL_CTES},
        scored AS (
            SELECT CAST(round(quality_score * 1000000) AS BIGINT) AS c,
                   is_good
            FROM pred JOIN labels USING (doc_id)
        ),
        hist AS (
            SELECT c, COUNT(*) AS nv,
                   SUM(CASE WHEN is_good THEN 1 ELSE 0 END) AS n1v
            FROM scored GROUP BY c
        ),
        cum AS (
            SELECT nv, n1v,
                   COALESCE(SUM(nv) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cumn
            FROM hist
        ),
        st AS (
            SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
                   CAST(SUM(nv) - SUM(n1v) AS BIGINT) AS n2,
                   CAST(SUM(n1v * (2 * cumn + nv + 1)) AS BIGINT) AS r2
            FROM cum
        )
        SELECT n1 AS n_pos, n2 AS n_neg,
               CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
                         / CAST(2 * n1 * n2 AS DOUBLE) END AS auc
        FROM st
    """,
)
def classifier_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import rank_auc

    (documents,) = load(spark, sf_dir, "documents")
    pred = text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    ).select("doc_id", "quality_score")
    labels = text.quality_score(documents).select(
        "doc_id", (F.col("quality_decile") >= 6).alias("is_good")
    )
    joined = pred.join(labels, on="doc_id")
    return rank_auc(joined, "quality_score", F.col("is_good"), scale=1_000_000)


@register(
    "lang_id_cohens_kappa",
    op_ids="beyond-reference model evaluation: Cohen's kappa of the "
    "language-ID heuristic vs the gold lang column — chance-corrected "
    "agreement from the same confusion relation lang_id_confusion "
    "reports, reduced to ALL-INTEGER sufficient statistics: kappa = "
    "(n*diag - sum_k row_k*col_k) / (n^2 - sum_k row_k*col_k), one "
    "double division at the edge (bit-stable cross-engine); the "
    "label-marginal join carries one row per language",
    description="Cohen's kappa, raw agreement count, and doc total "
    "for lang-ID vs gold labels — the label-quality QA number that "
    "discounts agreement expected by chance",
    oracle=f"""
        WITH preds AS ({_lang_id_oracle()}),
        joined AS (
            SELECT d.lang AS true_lang, p.pred_lang
            FROM documents d JOIN preds p USING (doc_id)
        ),
        cells AS (
            SELECT true_lang, pred_lang, COUNT(*) AS n
            FROM joined GROUP BY 1, 2
        ),
        st AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
                        AS BIGINT) AS n_agree
            FROM cells
        ),
        rows_ AS (SELECT true_lang AS k, SUM(n) AS row_n FROM cells GROUP BY 1),
        cols_ AS (SELECT pred_lang AS k, SUM(n) AS col_n FROM cells GROUP BY 1),
        rc AS (
            SELECT CAST(COALESCE(SUM(row_n * col_n), 0) AS BIGINT) AS rc_sum
            FROM rows_ JOIN cols_ USING (k)
        )
        SELECT n_docs, n_agree,
               CASE WHEN n_docs * n_docs = rc_sum THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(n_docs * n_agree - rc_sum AS DOUBLE)
                         / CAST(n_docs * n_docs - rc_sum AS DOUBLE) END AS kappa
        FROM st CROSS JOIN rc
    """,
)
def lang_id_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    preds = text.lang_id(documents).select("doc_id", "pred_lang")
    joined = documents.select("doc_id", F.col("lang").alias("true_lang")).join(
        preds, on="doc_id"
    )
    cells = joined.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    cells = cells.persist()
    cells.count()  # three consumer subtrees share one final job
    st = cells.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("n_agree"),
    )
    rows_ = cells.groupBy(F.col("true_lang").alias("k")).agg(
        F.sum("n").alias("row_n")
    )
    cols_ = cells.groupBy(F.col("pred_lang").alias("k")).agg(
        F.sum("n").alias("col_n")
    )
    rc = (
        rows_.join(cols_, on="k")
        .agg(
            F.coalesce(F.sum(F.col("row_n") * F.col("col_n")), F.lit(0))
            .cast("long")
            .alias("rc_sum")
        )
    )
    # Degenerate guard (ADVICE r7): rc_sum == n^2 (all mass in one
    # marginal cell) makes kappa undefined — explicit NULL on both
    # engines instead of Spark-NULL-vs-DuckDB-inf divergence.
    return st.crossJoin(F.broadcast(rc)).select(
        "n_docs",
        "n_agree",
        F.expr(
            "CASE WHEN n_docs * n_docs = rc_sum THEN CAST(NULL AS DOUBLE)"
            " ELSE CAST(n_docs * n_agree - rc_sum AS DOUBLE)"
            " / CAST(n_docs * n_docs - rc_sum AS DOUBLE) END"
        ).alias("kappa"),
    )


@register(
    "bloom_prefiltered_incremental",
    op_ids="beyond-reference Bloom-ACCELERATED incremental dedup: the "
    "composition bloom_membership_prefilter exists for — the batch "
    "probes the history bitmap, only the maybe-seen slice (true dups "
    "+ FPR) pays the exact anti-join against the full history, and "
    "the result is PROVABLY identical to the plain anti-join because "
    "the filter has no false negatives. The oracle IS the plain "
    "anti-join, so a green hash is an exact-equivalence proof, not a "
    "band",
    description="batch docs (doc_id%3==0) not present in history "
    "(doc_id%3!=0) by exact text key, computed via the Bloom "
    "shortcut; output equals the plain NOT EXISTS anti-join row for "
    "row",
    oracle="""
        SELECT p.doc_id
        FROM documents p
        WHERE p.doc_id % 3 = 0
          AND NOT EXISTS (
              SELECT 1 FROM documents h
              WHERE h.doc_id % 3 <> 0 AND h.text = p.text
          )
    """,
)
def bloom_prefiltered_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.membership import (
        bloom_prefiltered_new_rows,
    )

    (documents,) = load(spark, sf_dir, "documents")
    history = documents.where(F.col("doc_id") % 3 != 0)
    batch = documents.where(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    return bloom_prefiltered_new_rows(
        batch, history, key_col="text", id_col="doc_id", m_bits=4096, k=3
    ).select("doc_id")


@register(
    "approx_topk_sketch_production",
    op_ids="beyond-reference heavy hitters, PRODUCTION form (VERDICT "
    "r7 item 5): the Space-Saving sketch arm ALONE — one "
    "partial-aggregated pass with maxItemsTracked bounded state, no "
    "exact ground-truth arm — the linear path approx_topk_heavy_"
    "hitters evaluates. Oracle-exact under the exactness regime "
    "(capacity 10000 >= vocabulary => sketched counts equal exact "
    "counts), and TIE-SAFE: the output is the (rank, count) vector, "
    "not the gram set, so equal-count grams at the k-th boundary "
    "cannot hash-diverge between engines",
    description="the top-10 word-bigram count vector straight from "
    "approx_top_k: rank (by count desc) and the sketched count, "
    "which the exactness regime makes equal to the exact top-10 "
    "counts",
    oracle=f"""
        WITH {_DOCS_ARR_CTE},
        bi AS (
            SELECT array_to_string(list_slice(arr, i, i + 1), ' ') AS gram
            FROM docs, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i)
        ),
        c AS (SELECT gram, COUNT(*) AS c FROM bi GROUP BY 1),
        top AS (SELECT c FROM c ORDER BY c DESC LIMIT 10)
        SELECT CAST(row_number() OVER (ORDER BY c DESC) AS BIGINT) AS rnk,
               CAST(c AS BIGINT) AS cnt
        FROM top
    """,
)
def approx_topk_sketch_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One narrow pass: explode bigrams -> approx_top_k partial
    aggregation (per-partition Space-Saving state of maxItemsTracked
    entries, merged once) -> explode the k results. The row_number
    window orders the k_top=10 returned entries only — bounded by the
    sketch size, never by data — so the single-partition window stage
    is O(k). This is the SCALING.md production row next to the eval's
    both-arms cost."""
    from pyspark.sql import Window

    from nhl_data_warehouse_spark.operators.text import _word_bigrams

    k_top = 10
    (documents,) = load(spark, sf_dir, "documents")
    grams = documents.select(F.explode(_word_bigrams("text")).alias("gram"))
    counts = (
        grams.agg(F.expr(f"approx_top_k(gram, {k_top}, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.count").cast("long").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc())
    return counts.select(
        F.row_number().over(w).cast("long").alias("rnk"), "cnt"
    )


@register(
    "auc_by_language",
    op_ids="beyond-reference SLICED model evaluation: per-language "
    "exact ROC AUC of the quality classifier (operators/stats.py "
    "grouped_rank_auc) — same Mann-Whitney rank identity and "
    "micro-score grain as classifier_auc_eval, but every stage is "
    "keyed by the slice, so unlike the global form there is NO "
    "unpartitioned stage at all: the scorecard shape (metric x "
    "slice) that catches a model failing on one stratum while the "
    "global number looks fine",
    description="exact tie-aware ROC AUC of the hashed-linear "
    "quality score vs the heuristic label, per document language, "
    "with per-slice class sizes",
    oracle=f"""
        WITH {_HLQ_EVAL_CTES},
        scored AS (
            SELECT d.lang,
                   CAST(round(quality_score * 1000000) AS BIGINT) AS c,
                   is_good
            FROM pred JOIN labels USING (doc_id)
            JOIN documents d USING (doc_id)
        ),
        hist AS (
            SELECT lang, c, COUNT(*) AS nv,
                   SUM(CASE WHEN is_good THEN 1 ELSE 0 END) AS n1v
            FROM scored GROUP BY lang, c
        ),
        cum AS (
            SELECT lang, nv, n1v,
                   COALESCE(SUM(nv) OVER (PARTITION BY lang ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cumn
            FROM hist
        ),
        st AS (
            SELECT lang,
                   CAST(SUM(n1v) AS BIGINT) AS n1,
                   CAST(SUM(nv) - SUM(n1v) AS BIGINT) AS n2,
                   CAST(SUM(n1v * (2 * cumn + nv + 1)) AS BIGINT) AS r2
            FROM cum GROUP BY lang
        )
        SELECT lang, n1 AS n_pos, n2 AS n_neg,
               CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(NULL AS DOUBLE)
                    ELSE CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
                         / CAST(2 * n1 * n2 AS DOUBLE) END AS auc
        FROM st
    """,
)
def auc_by_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import grouped_rank_auc

    (documents,) = load(spark, sf_dir, "documents")
    pred = text.hashed_linear_quality(
        documents, n_buckets=256, bias=0.0, threshold=0.5, salt="hlq-v1"
    ).select("doc_id", "quality_score")
    labels = text.quality_score(documents).select(
        "doc_id", (F.col("quality_decile") >= 6).alias("is_good")
    )
    joined = (
        pred.join(labels, on="doc_id")
        .join(documents.select("doc_id", "lang"), on="doc_id")
    )
    return grouped_rank_auc(
        joined, "lang", "quality_score", F.col("is_good"), scale=1_000_000
    )


def _audio_oracle() -> str:
    import struct as _struct  # noqa: F401 — parity with the generator

    from nhl_data_warehouse_spark.operators.multimodal import (
        _WAV_STEP,
        wav_payload,  # noqa: F401 — oracle literals derive from it
    )

    rows = []
    for i in range(8):
        n = 500 + 137 * i
        samples = [
            ((i + 1 + j * _WAV_STEP) % 65536) - 32768 for j in range(n)
        ]
        rows.append(
            f"({i}, 16000, {n}, {max(abs(s) for s in samples)},"
            f" {sum(s * s for s in samples)})"
        )
    return f"""
        SELECT CAST(media_id AS BIGINT) AS media_id,
               CAST(sample_rate AS BIGINT) AS sample_rate,
               CAST(n_samples AS BIGINT) AS n_samples,
               CAST(peak_abs AS BIGINT) AS peak_abs,
               CAST(sum_sq AS BIGINT) AS sum_sq,
               sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE))
                   AS rms
        FROM (VALUES {", ".join(rows)})
             AS t(media_id, sample_rate, n_samples, peak_abs, sum_sq)
    """


@register(
    "audio_ingest_pcm_stats",
    op_ids="beyond-reference AUDIO modality: real PCM16/WAV parse via "
    "Arrow-batched mapInPandas — stdlib struct header read + one "
    "vectorized numpy int16 view per item, INTEGER sample statistics "
    "(peak, sum of squares) so RMS is a single IEEE expression; the "
    "fixtures are stdlib-generated deterministic WAVs, so the oracle "
    "holds exact literals from the same pure function (the PNG "
    "binaryfile_ingest_meta pattern, extended to the audio lane)",
    description="8 deterministic PCM16 WAV fixtures parsed to exact "
    "per-item sample stats (rate, count, peak, energy) plus RMS",
    oracle=_audio_oracle(),
)
def audio_ingest_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.multimodal import (
        audio_pcm_stats,
        wav_payload,
    )

    media = spark.createDataFrame(
        [(i, bytearray(wav_payload(500 + 137 * i, seed=i + 1))) for i in range(8)],
        "media_id long, payload binary",
    )
    stats = audio_pcm_stats(media)
    return stats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        "peak_abs",
        "sum_sq",
        F.expr(
            "sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE))"
        ).alias("rms"),
    )


@register(
    "lang_id_macro_f1",
    op_ids="beyond-reference model evaluation: per-class precision / "
    "recall / F1 and macro-F1 from the lang-ID confusion relation — "
    "completing the classifier scorecard next to accuracy "
    "(lang_id_confusion), chance-corrected agreement (kappa), AUC "
    "and calibration. Every per-class metric is a fixed-order ratio "
    "of integer confusion cells (F1 = 2tp/(2tp+fp+fn), no "
    "intermediate p*r rounding); macro-F1 folds the per-class F1s in "
    "language order on both engines",
    description="per-gold-language tp/fp/fn, precision, recall, F1 "
    "of the lang-ID heuristic, plus the macro-F1 constant column",
    oracle=f"""
        WITH preds AS ({_lang_id_oracle()}),
        joined AS (
            SELECT d.lang AS true_lang, p.pred_lang
            FROM documents d JOIN preds p USING (doc_id)
        ),
        cells AS (
            SELECT true_lang, pred_lang, COUNT(*) AS n
            FROM joined GROUP BY 1, 2
        ),
        gold AS (
            SELECT true_lang AS lang, CAST(SUM(n) AS BIGINT) AS n_gold
            FROM cells GROUP BY 1
        ),
        predm AS (
            SELECT pred_lang AS lang, CAST(SUM(n) AS BIGINT) AS n_pred
            FROM cells GROUP BY 1
        ),
        diag AS (
            SELECT true_lang AS lang, CAST(SUM(n) AS BIGINT) AS tp
            FROM cells WHERE true_lang = pred_lang GROUP BY 1
        ),
        perclass AS (
            SELECT g.lang,
                   COALESCE(d.tp, 0) AS tp,
                   COALESCE(p.n_pred, 0) - COALESCE(d.tp, 0) AS fp,
                   g.n_gold - COALESCE(d.tp, 0) AS fn
            FROM gold g
            LEFT JOIN diag d USING (lang)
            LEFT JOIN predm p USING (lang)
        ),
        scored AS (
            SELECT lang, tp, fp, fn,
                   CASE WHEN tp + fp = 0 THEN CAST(NULL AS DOUBLE)
                        ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                   END AS precision_,
                   CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall_,
                   CAST(2 * tp AS DOUBLE)
                       / CAST(2 * tp + fp + fn AS DOUBLE) AS f1
            FROM perclass
        ),
        macro AS (
            SELECT SUM(f1 ORDER BY lang) / COUNT(*) AS macro_f1 FROM scored
        )
        SELECT lang, tp, fp, fn, precision_ AS precision, recall_ AS recall,
               f1, macro_f1
        FROM scored, macro
    """,
)
def lang_id_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    preds = text.lang_id(documents).select("doc_id", "pred_lang")
    joined = documents.select("doc_id", F.col("lang").alias("true_lang")).join(
        preds, on="doc_id"
    )
    cells = joined.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    cells = cells.persist()
    cells.count()  # three marginal consumers share one computation
    gold = cells.groupBy(F.col("true_lang").alias("lang")).agg(
        F.sum("n").cast("long").alias("n_gold")
    )
    predm = cells.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    diag = (
        cells.where(F.col("true_lang") == F.col("pred_lang"))
        .groupBy(F.col("true_lang").alias("lang"))
        .agg(F.sum("n").cast("long").alias("tp_"))
    )
    perclass = (
        gold.join(diag, "lang", "left")
        .join(predm, "lang", "left")
        .select(
            "lang",
            F.coalesce("tp_", F.lit(0)).alias("tp"),
            (F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp_", F.lit(0))).alias("fp"),
            (F.col("n_gold") - F.coalesce("tp_", F.lit(0))).alias("fn"),
        )
    )
    scored = perclass.select(
        "lang",
        "tp",
        "fp",
        "fn",
        F.expr(
            "CASE WHEN tp + fp = 0 THEN CAST(NULL AS DOUBLE)"
            " ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END"
        ).alias("precision"),
        F.expr("CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)").alias("recall"),
        F.expr(
            "CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)"
        ).alias("f1"),
    )
    scored = scored.persist()
    scored.count()  # macro fold + row output share one computation
    macro = scored.agg(
        (
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("lang", "f1"))),
                    lambda s: s["f1"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1))
        ).alias("macro_f1")
    )
    return scored.crossJoin(F.broadcast(macro))


@register(
    "url_canonical_dedup",
    op_ids="beyond-reference URL-canonicalization dedup (the C4/CCNet "
    "first-line dedup grain: normalize scheme/host case, default "
    "ports, tracking params, trailing slashes, fragments -> exact "
    "group-by; pure-expression normalization, no UDF)",
    description="documents re-keyed by synthetic crawl URLs (4 messy "
    "encodings per page, http/https alternating per page): canonical "
    "URL groups with representative and copy count",
    oracle=r"""
        WITH urls AS (
            SELECT doc_id,
                   doc_id // 4 AS k,
                   doc_id % 4 AS v,
                   CASE WHEN (doc_id // 4) % 2 = 0 THEN 'https' ELSE 'http' END AS sch,
                   CASE WHEN (doc_id // 4) % 2 = 0 THEN ':443' ELSE ':80' END AS port
            FROM documents
        ),
        built AS (
            SELECT doc_id,
                   CASE v
                     WHEN 0 THEN upper(sch) || '://Example.COM' || port || '/a/'
                                 || CAST(k AS VARCHAR) || '/?utm_source=feed&b=2&q=1#frag'
                     WHEN 1 THEN sch || '://example.com/a/' || CAST(k AS VARCHAR) || '?q=1&b=2'
                     WHEN 2 THEN sch || '://EXAMPLE.com' || port || '/a/'
                                 || CAST(k AS VARCHAR) || '/?q=1&b=2&utm_campaign=x&'
                     ELSE sch || '://example.com/a/' || CAST(k AS VARCHAR)
                          || '?b=2&gclid=z&q=1&ref=tw#x'
                   END AS url
            FROM urls
        ),
        stripped AS (
            SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS u FROM built
        ),
        comp AS (
            SELECT doc_id,
                   lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
                   lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS auth,
                   regexp_replace(regexp_extract(u,
                       '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1), '/+$', '') AS path,
                   regexp_extract(u, '\?(.*)$', 1) AS q
            FROM stripped
        ),
        normed AS (
            SELECT doc_id, scheme,
                   CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
                        WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
                        ELSE auth END AS host,
                   path,
                   array_to_string(list_sort(list_filter(string_split(q, '&'),
                       x -> x <> '' AND NOT regexp_matches(x,
                           '^(utm_[^=&]*|gclid|fbclid|ref)(=|$)'))), '&') AS qs
            FROM comp
        ),
        canon AS (
            SELECT doc_id,
                   CASE WHEN scheme = '' OR host = '' THEN NULL
                        ELSE scheme || '://' || host || path ||
                             CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
                   END AS canonical_url
            FROM normed
        )
        SELECT canonical_url,
               MIN(doc_id) AS representative_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM canon
        WHERE canonical_url IS NOT NULL
        GROUP BY canonical_url
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-grain first-line dedup (C4 §2.1 / CCNet §3 both dedup by
    normalized URL before any content pass). The testdata has no URL
    column, so every page gets FOUR deterministic messy encodings of
    the same crawl URL (case-shifted scheme+host, explicit default
    port, tracking params in shuffled positions, trailing slash,
    fragment — one per ``doc_id % 4``), alternating http/https per
    page: groups of 4 consecutive doc_ids collapse to one canonical
    URL iff the normalization handles every axis of the spec.
    """
    (documents,) = load(spark, sf_dir, "documents")
    k = F.expr("doc_id div 4")
    v = F.col("doc_id") % 4
    sch = F.when(k % 2 == 0, F.lit("https")).otherwise(F.lit("http"))
    port = F.when(k % 2 == 0, F.lit(":443")).otherwise(F.lit(":80"))
    ks = k.cast("string")
    url = (
        F.when(
            v == 0,
            F.concat(
                F.upper(sch),
                F.lit("://Example.COM"),
                port,
                F.lit("/a/"),
                ks,
                F.lit("/?utm_source=feed&b=2&q=1#frag"),
            ),
        )
        .when(
            v == 1,
            F.concat(sch, F.lit("://example.com/a/"), ks, F.lit("?q=1&b=2")),
        )
        .when(
            v == 2,
            F.concat(
                sch,
                F.lit("://EXAMPLE.com"),
                port,
                F.lit("/a/"),
                ks,
                F.lit("/?q=1&b=2&utm_campaign=x&"),
            ),
        )
        .otherwise(
            F.concat(
                sch,
                F.lit("://example.com/a/"),
                ks,
                F.lit("?b=2&gclid=z&q=1&ref=tw#x"),
            )
        )
    )
    return dedup.url_dedup_groups(
        documents.select("doc_id", url.alias("url"))
    )


# shared by the two held-out-LM queries: per-target-doc mean NLL under
# an add-1-smoothed unigram LM trained on the doc_id % 10 = 0 slice
_HELDOUT_NLL_CTES = """
        refslice AS (
            SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM documents WHERE doc_id % 10 = 0
        ),
        vocab AS (SELECT tok, COUNT(*) AS c FROM refslice GROUP BY tok),
        tot AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_ref,
                   CAST(COUNT(*) AS BIGINT) AS v_ref
            FROM vocab
        ),
        tgt AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM documents WHERE doc_id % 10 <> 0
        ),
        tokscored AS (
            SELECT t.doc_id,
                   CASE WHEN v.c IS NULL THEN 1 ELSE 0 END AS oov,
                   CAST(round(ln(CAST(COALESCE(v.c, 0) + 1 AS DOUBLE)
                        / CAST(n_ref + 1 * (v_ref + 1) AS DOUBLE)), 6)
                        AS DECIMAL(12,6)) AS logp
            FROM tgt t LEFT JOIN vocab v USING (tok) CROSS JOIN tot
        ),
        perdoc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(oov) AS BIGINT) AS oov_tokens,
                   CAST(-(CAST(SUM(logp) AS DOUBLE)) / COUNT(*) AS DOUBLE) AS avg_nll
            FROM tokscored GROUP BY doc_id
        )
"""


@register(
    "heldout_perplexity_scores",
    op_ids="beyond-reference held-out n-gram LM quality score (the "
    "CCNet/KenLM gate shape: add-k-smoothed unigram LM trained on a "
    "held-out reference slice, OOV mass in one extra vocab slot, "
    "per-doc mean NLL; exact integer counts + 6dp-rounded logs "
    "summed as DECIMAL)",
    description="docs outside the doc_id%10=0 reference slice scored "
    "by mean negative log-likelihood under the slice's add-1 unigram "
    "LM; (doc_id, n_tokens, oov_tokens, avg_nll)",
    oracle="WITH " + _HELDOUT_NLL_CTES + """
        SELECT doc_id, n_tokens, oov_tokens, avg_nll FROM perdoc
    """,
)
def heldout_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    ref = documents.where(F.col("doc_id") % 10 == 0)
    tgt = documents.where(F.col("doc_id") % 10 != 0)
    return text.heldout_unigram_nll(tgt, ref)


@register(
    "perplexity_tertile_gate",
    op_ids="beyond-reference perplexity corpus gate (CCNet "
    "head/middle/tail: per-language value-grain terciles of the "
    "held-out-LM NLL over the bounded cell histogram; doc + token "
    "mass per bucket — the table that decides per-language sampling "
    "rates)",
    description="per (lang, tercile-bucket) doc count and token mass, "
    "buckets cut at the smallest NLL cell covering 1/3 and 2/3 of "
    "each language's scored docs",
    oracle="WITH " + _HELDOUT_NLL_CTES + """,
        cells AS (
            SELECT d.lang,
                   CAST(round(p.avg_nll * 1000000) AS BIGINT) AS c,
                   p.n_tokens
            FROM perdoc p JOIN documents d USING (doc_id)
        ),
        hist AS (
            SELECT lang, c, COUNT(*) AS n, SUM(n_tokens) AS ws
            FROM cells GROUP BY lang, c
        ),
        cum AS (
            SELECT lang, c, n, ws,
                   SUM(n) OVER (PARTITION BY lang ORDER BY c) AS cumn
            FROM hist
        ),
        langtot AS (SELECT lang, MAX(cumn) AS ng FROM cum GROUP BY lang),
        bounds AS (
            SELECT cum.lang,
                   MIN(CASE WHEN cumn * 3 >= 1 * ng THEN c END) AS b1,
                   MIN(CASE WHEN cumn * 3 >= 2 * ng THEN c END) AS b2
            FROM cum JOIN langtot ON cum.lang = langtot.lang
            GROUP BY cum.lang
        )
        SELECT hist.lang,
               CAST(CASE WHEN c > b1 THEN 1 ELSE 0 END
                    + CASE WHEN c > b2 THEN 1 ELSE 0 END + 1 AS INTEGER)
                   AS bucket,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(SUM(ws) AS BIGINT) AS tokens_total
        FROM hist JOIN bounds ON hist.lang = bounds.lang
        GROUP BY hist.lang, bucket
    """,
)
def perplexity_tertile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end perplexity-gates-the-corpus: the held-out LM scores
    every non-reference doc, and ``quantile_bucket_report`` cuts each
    language into CCNet-style terciles with doc + token mass — the
    report that sets per-language head/middle/tail sampling rates."""
    from nhl_data_warehouse_spark.operators import stats

    (documents,) = load(spark, sf_dir, "documents")
    ref = documents.where(F.col("doc_id") % 10 == 0)
    tgt = documents.where(F.col("doc_id") % 10 != 0)
    scored = text.heldout_unigram_nll(tgt, ref)
    labeled = scored.join(
        documents.select("doc_id", "lang"), on="doc_id"
    )
    return (
        stats.quantile_bucket_report(
            labeled, "lang", "avg_nll", weight_col="n_tokens", n_buckets=3
        )
        .withColumnRenamed("weight_total", "tokens_total")
    )


@register(
    "within_doc_dedup_stitch",
    op_ids="beyond-reference WITHIN-document segment dedup + stitch "
    "(the Dolma/CCNet per-document repetition strip — first "
    "occurrence of each distinct trimmed segment survives, survivors "
    "rejoined in order; dedup decided at the (doc, segment-hash) "
    "window grain, text shuffles once keyed by doc id for the "
    "stitch)",
    description="documents seeded with a repeated ' table '-delimited "
    "promo segment (twice unless doc_id%3=0): per doc the segment "
    "counts, removed char mass, and the stitched clean text",
    oracle="""
        WITH seeded AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0 THEN ''
                      ELSE ' table promo block ' || CAST(doc_id % 7 AS VARCHAR)
                      END
                   || ' table promo block ' || CAST(doc_id % 7 AS VARCHAR)
                       AS text
            FROM documents
        ),
        parts AS (
            SELECT doc_id, string_split(text, ' table ') AS ps FROM seeded
        ),
        segs AS (
            SELECT doc_id, i, trim(ps[i]) AS s
            FROM parts, unnest(generate_series(1, len(ps))) AS u(i)
            WHERE length(trim(ps[i])) >= 1
        ),
        flagged AS (
            SELECT doc_id, i, s,
                   MIN(i) OVER (PARTITION BY doc_id, md5(s)) = i AS keep
            FROM segs
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_segs,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN keep THEN 0 ELSE length(s) END) AS BIGINT)
                   AS chars_removed,
               string_agg(CASE WHEN keep THEN s END, ' table ' ORDER BY i)
                   AS clean_text
        FROM flagged
        GROUP BY doc_id
    """,
)
def within_doc_dedup_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition strip on the newline-free testdata:
    ``' table '`` stands in for blank-line boundaries (the
    paragraph_dedup_stats convention) and every document is seeded
    with a deterministic repeated promo segment — twice for
    doc_id%3!=0 (one removable copy), once otherwise (nothing to
    remove) — so the dedup, the char accounting, and the stitch all
    have planted ground truth. (Docs whose text happens to end in the
    corpus word 'table' merge the first planted delimiter — an
    overlapping-split property both engines share, so the oracle
    agrees on those rows too.)"""
    (documents,) = load(spark, sf_dir, "documents")
    promo = F.concat(
        F.lit(" table promo block "), (F.col("doc_id") % 7).cast("string")
    )
    seeded = documents.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("")).otherwise(promo),
            promo,
        ).alias("text"),
    )
    return dedup.within_doc_segment_dedup(seeded, delim=" table ")


@register(
    "domain_concentration_report",
    op_ids="beyond-reference domain head-concentration report (the "
    "C4/FineWeb per-site cap diagnostic: site key = canonical host "
    "minus www., one map-side site aggregate, broadcast total, "
    "global top-k via TakeOrdered, cumulative share over the k-row "
    "result only — the unbounded site grain never passes an "
    "unpartitioned window)",
    description="synthetic crawl hosts with geometric skew (6 sites, "
    "mass ~1/2/4/8/16/33 per 64 docs, case-shifted and www-prefixed "
    "variants): top-4 sites by doc count with doc/char share and "
    "cumulative share",
    oracle="""
        WITH urls AS (
            SELECT doc_id, n_chars,
                   CASE
                     WHEN doc_id % 64 = 0 THEN 0
                     WHEN doc_id % 64 < 3 THEN 1
                     WHEN doc_id % 64 < 7 THEN 2
                     WHEN doc_id % 64 < 15 THEN 3
                     WHEN doc_id % 64 < 31 THEN 4
                     ELSE 5
                   END AS d
            FROM documents
        ),
        built AS (
            SELECT doc_id, n_chars,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'https://www.site' || CAST(d AS VARCHAR)
                             || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                        ELSE 'https://SITE' || CAST(d AS VARCHAR)
                             || '.EXAMPLE.ORG/p/' || CAST(doc_id AS VARCHAR)
                   END AS url
            FROM urls
        ),
        hosts AS (
            SELECT doc_id, n_chars,
                   regexp_replace(
                       lower(regexp_extract(regexp_replace(trim(url), '#.*$', ''),
                           '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)),
                       '^www\\.', '') AS site
            FROM built
        ),
        sites AS (
            SELECT site,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS weight_total
            FROM hosts
            WHERE site <> ''
            GROUP BY site
        ),
        tot AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
                   CAST(SUM(weight_total) AS BIGINT) AS tw
            FROM sites
        ),
        top AS (
            SELECT * FROM sites ORDER BY n_docs DESC, site ASC LIMIT 4
        )
        SELECT site, n_docs, weight_total,
               CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE) AS doc_share,
               CAST(SUM(n_docs) OVER (ORDER BY n_docs DESC, site ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / CAST(td AS DOUBLE) AS cum_doc_share,
               CAST(weight_total AS DOUBLE) / CAST(tw AS DOUBLE)
                   AS weight_share
        FROM top CROSS JOIN tot
    """,
)
def domain_concentration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-concentration over synthetic crawl hosts: 6 sites with
    geometric doc mass, half the URLs ``www.``-prefixed lowercase and
    half case-shifted bare — the report is correct only if the site
    key folds both variants together."""
    (documents,) = load(spark, sf_dir, "documents")
    s = F.col("doc_id") % 64
    d = (
        F.when(s == 0, 0)
        .when(s < 3, 1)
        .when(s < 7, 2)
        .when(s < 15, 3)
        .when(s < 31, 4)
        .otherwise(5)
    ).cast("string")
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("https://www.site"),
            d,
            F.lit(".example.org/p/"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://SITE"),
            d,
            F.lit(".EXAMPLE.ORG/p/"),
            F.col("doc_id").cast("string"),
        )
    )
    return dedup.domain_concentration(
        documents.select(url.alias("url"), "n_chars"),
        weight_col="n_chars",
        top_k=4,
    )


@register(
    "heldout_interp_bigram_scores",
    op_ids="beyond-reference Jelinek-Mercer interpolated bigram LM "
    "scoring against a held-out reference (lam * ML-bigram + "
    "(1-lam) * add-1 unigram with OOV slot — the order-2 backoff "
    "shape of the CCNet/KenLM gate; unseen contexts back off to the "
    "strictly-positive unigram arm, three token-keyed LEFT joins)",
    description="docs outside the doc_id%10=0 reference slice scored "
    "by mean NLL under the slice's interpolated bigram LM (lam=0.75); "
    "(doc_id, n_bigrams, unseen_bigrams, avg_interp_nll)",
    oracle="""
        WITH reft AS (
            SELECT list_filter(string_split(text, ' '), t -> t <> '') AS ts
            FROM documents WHERE doc_id % 10 = 0
        ),
        vocab AS (
            SELECT tok, COUNT(*) AS c
            FROM (SELECT unnest(ts) AS tok FROM reft) GROUP BY tok
        ),
        tot AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_ref,
                   CAST(COUNT(*) AS BIGINT) AS v_ref
            FROM vocab
        ),
        refbi AS (
            SELECT ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] AS gram
            FROM (SELECT ts, CAST(unnest(range(1, len(ts))) AS BIGINT) AS i
                  FROM reft WHERE len(ts) >= 2)
        ),
        cb AS (SELECT gram, COUNT(*) AS c_ab FROM refbi GROUP BY gram),
        cl AS (SELECT string_split(gram, ' ')[1] AS w1, SUM(c_ab) AS c_w1
               FROM cb GROUP BY 1),
        tgt AS (
            SELECT doc_id,
                   ts[CAST(i AS INT)] AS w1,
                   ts[CAST(i + 1 AS INT)] AS w2,
                   ts[CAST(i AS INT)] || ' ' || ts[CAST(i + 1 AS INT)] AS gram
            FROM (SELECT doc_id, ts,
                         CAST(unnest(range(1, len(ts))) AS BIGINT) AS i
                  FROM (SELECT doc_id,
                               list_filter(string_split(text, ' '),
                                           t -> t <> '') AS ts
                        FROM documents WHERE doc_id % 10 <> 0)
                  WHERE len(ts) >= 2)
        ),
        scoredbi AS (
            SELECT t.doc_id,
                   CASE WHEN cb.c_ab IS NULL THEN 1 ELSE 0 END AS unseen,
                   CAST(ROUND(ln(
                       CAST(0.75 AS DOUBLE)
                         * (CAST(COALESCE(cb.c_ab, 0) AS DOUBLE)
                            / CAST(COALESCE(cl.c_w1, 1) AS DOUBLE))
                       + CAST(0.25 AS DOUBLE)
                         * (CAST(COALESCE(v.c, 0) + 1 AS DOUBLE)
                            / CAST(tot.n_ref + 1 * (tot.v_ref + 1) AS DOUBLE))
                   ), 6) AS DECIMAL(12,6)) AS logp
            FROM tgt t
            LEFT JOIN cb ON cb.gram = t.gram
            LEFT JOIN cl ON cl.w1 = t.w1
            LEFT JOIN vocab v ON v.tok = t.w2
            CROSS JOIN tot
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(unseen) AS BIGINT) AS unseen_bigrams,
               CAST(-(CAST(SUM(logp) AS DOUBLE)) / COUNT(*) AS DOUBLE)
                   AS avg_interp_nll
        FROM scoredbi GROUP BY doc_id
    """,
)
def heldout_interp_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    ref = documents.where(F.col("doc_id") % 10 == 0)
    tgt = documents.where(F.col("doc_id") % 10 != 0)
    return text.heldout_interp_bigram_nll(tgt, ref)


# round 13: clustering-agreement scoring of a sketch partition
from nhl_data_warehouse_spark.operators.stats import (  # noqa: E402
    ARI_EXPR as _ARI_EXPR,
)


@register(
    "dedup_partition_ari",
    op_ids="beyond-reference clustering-agreement eval: Adjusted "
    "Rand Index (pair-counting, chance-corrected, "
    "label-permutation-invariant) between the exact-duplicate "
    "partition (md5 of content) and the simhash-16 sketch partition "
    "— the dedup-eval question 'does the cheap sketch partition "
    "agree with exact-dup truth, or does it over-merge?'. Contingency "
    "cells + marginals are exact integers, pair sums accumulate in "
    "DECIMAL(38,0), ARI is ONE fixed-order double expression shared "
    "verbatim with the oracle",
    description="ARI between exact-content groups and simhash-16 "
    "buckets over documents, with the three raw pair sums",
    oracle=f"""
        WITH tokens AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                              x -> x <> '')) AS tok
            FROM documents
        ),
        votes AS (
            SELECT doc_id, b.bit,
                   CASE WHEN strpos('89abcdef',
                                    substring(md5(tok), b.bit + 1, 1)) > 0
                        THEN 1 ELSE -1 END AS vote
            FROM tokens, (SELECT unnest(generate_series(0, 15)) AS bit) b
        ),
        sums AS (SELECT doc_id, bit, SUM(vote) AS s FROM votes GROUP BY 1, 2),
        sk AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << bit
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM sums GROUP BY doc_id
        ),
        lab AS (
            SELECT md5(d.text) AS a, sk.simhash AS b
            FROM documents d JOIN sk ON d.doc_id = sk.doc_id
        ),
        cells AS (SELECT a, b, COUNT(*) AS nij FROM lab GROUP BY 1, 2),
        tot AS (
            SELECT CAST(SUM(nij) AS BIGINT) AS n,
                   CAST(SUM(CAST(nij AS HUGEINT) * (nij - 1)) AS DOUBLE)
                       AS sij2
            FROM cells
        ),
        am AS (
            SELECT CAST(SUM(CAST(na AS HUGEINT) * (na - 1)) AS DOUBLE)
                       AS sa2
            FROM (SELECT SUM(nij) AS na FROM cells GROUP BY a)
        ),
        bm AS (
            SELECT CAST(SUM(CAST(nb AS HUGEINT) * (nb - 1)) AS DOUBLE)
                       AS sb2
            FROM (SELECT SUM(nij) AS nb FROM cells GROUP BY b)
        )
        SELECT n AS n_rows, sij2 AS pairs2_both, sa2 AS pairs2_a,
               sb2 AS pairs2_b,
               ({_ARI_EXPR}) AS ari_statistic
        FROM tot, am, bm
    """,
)
def dedup_partition_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nhl_data_warehouse_spark.operators.stats import (
        partition_agreement_ari,
    )

    (documents,) = load(spark, sf_dir, "documents")
    sk = dedup.simhash(documents, bits=16)
    lab = (
        documents.select("doc_id", F.md5("text").alias("pa"))
        .join(sk, on="doc_id")
        .select("pa", F.col("simhash").alias("pb"))
    )
    return partition_agreement_ari(lab, "pa", "pb")
