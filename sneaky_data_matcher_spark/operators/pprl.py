"""Privacy-preserving record linkage (PPRL): CLK Bloom-filter encodings
+ Dice-coefficient similarity join.

The reference matches on plaintext key equality
(services/SearchService.java:165); real-world linkage across parties
(hospitals, registries, ad networks) cannot exchange plaintext. The
standard public-literature answer (Schnell, Bachteler & Reiher, BMC
2009; Vatsalan et al. survey, Inf. Syst. 2013) is the Cryptographic
Long-term Key: every record's token/q-gram set is hashed into ONE
fixed-width Bloom filter with K hash functions, parties exchange only
the bit vectors, and similarity is the Dice coefficient over set bits

    dice(A, B) = 2 * |A ∩ B| / (|A| + |B|).

Portable construction (the repo's winnowing/simhash trick): the K bit
positions of a token are double-hashed from two Horner polynomial
hashes over code points mod a 31-bit Mersenne prime,

    pos_i(t) = (h1(t) + i * h2(t)) mod CLK_BITS,   i in 0..K-1,

so DuckDB can recompute the encodings end-to-end and the driver oracle
checks the whole chain, not just the join.

CLKs are stored as sorted distinct INT ARRAYS of set-bit positions
(not bitstrings): both engines intersect lists natively, and the
cardinality |A| is just the array length.

Scale notes (100 TB):
  - the exact join is an inverted index over bit positions — only
    (doc_id, pos) ints are exploded, pairs shuffle as bare ids + one
    count, cardinalities join back on bare ids (the dedup.py r2
    lesson). A conservative length filter
    (2 * min(|A|,|B|) >= t * (|A|+|B|) - eps) prunes inside the join
    before the groupBy.
  - CLK_BITS bounds every posting list's density: with d-bit-dense
    encodings each position holds ~d/CLK_BITS of the corpus, so the
    exact index join is quadratic in the density, not the corpus —
    for planet-scale inputs use `hlsh_blocks` (Hamming-LSH: block on
    deterministic bit subsets, union over tables, then exact-verify
    candidates only), the same bucket-then-verify shape as
    operators/ann.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import portable_hash

# Distinct bases from simhash's 257/263 so CLK bits don't correlate with
# simhash bits on the same corpus; same Mersenne modulus.
PPRL_M = (1 << 31) - 1
PPRL_B1 = 269
PPRL_B2 = 271
CLK_BITS = 512
CLK_K = 3


def _horner(t: Column, base: int) -> Column:
    """Horner polynomial hash of one (lambda-var) token over code
    points — the shared portable fold bound to PPRL constants."""
    return portable_hash.horner(t, base, PPRL_M)


def _qgram_tokens(s: Column, q: int) -> Column:
    """Overlapping character q-grams (distinct, blanks dropped). A
    string shorter than q yields itself as the single gram — the
    standard CLK token domain (Schnell et al. use bigrams of each
    quasi-identifier field)."""
    starts = F.sequence(F.lit(1), F.greatest(F.length(s) - (q - 1), F.lit(1)))
    grams = F.transform(starts, lambda j: F.substring(s, j, q))
    return F.array_distinct(F.filter(grams, lambda x: x != ""))


def clk_encode(
    doc_text: Column,
    bits: int = CLK_BITS,
    k: int = CLK_K,
    qgram: int | None = None,
) -> Column:
    """doc_text -> sorted distinct array<long> of set-bit positions.

    Tokens are whitespace words by default, overlapping character
    q-grams when `qgram` is set (the PPRL-standard domain for short
    quasi-identifier strings). Each token's two Horner hashes are
    computed ONCE into a struct, then expanded to k double-hashed
    positions (the simhash r2 restructure lesson: never re-hash a
    token per output element)."""
    if qgram is not None:
        toks = _qgram_tokens(doc_text, qgram)
    else:
        toks = F.array_distinct(F.filter(F.split(doc_text, " "), lambda x: x != ""))
    hashed = F.transform(
        toks,
        lambda t: F.struct(
            _horner(t, PPRL_B1).alias("h1"), _horner(t, PPRL_B2).alias("h2")
        ),
    )
    pos = F.flatten(
        F.transform(
            hashed,
            lambda h: F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: (h["h1"] + i.cast("long") * h["h2"]) % bits,
            ),
        )
    )
    return F.array_sort(F.array_distinct(pos))


def clk_frame(
    canon: DataFrame,
    bits: int = CLK_BITS,
    k: int = CLK_K,
    id_col: str = "doc_id",
    text_col: str = "doc_text",
    qgram: int | None = None,
) -> DataFrame:
    """(id, text) -> (doc_id, clk array<long>, card int)."""
    enc = clk_encode(F.col(text_col), bits, k, qgram=qgram)
    return (
        canon.select(F.col(id_col).alias("doc_id"), enc.alias("clk"))
        .select("doc_id", "clk", F.size("clk").alias("card"))
        .filter(F.col("card") > 0)
    )


def dice_pairs(
    canon: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "doc_text",
    qgram: int | None = None,
) -> DataFrame:
    """All pairs (doc_id_a < doc_id_b) with CLK Dice >= threshold ->
    (doc_id_a, doc_id_b, dice). EXACT: the inverted index yields every
    pair sharing >= 1 bit, and dice >= t > 0 requires a shared bit.

    Plan: one explode, one pair groupBy (bare ids + count), two bare-id
    joins for cardinalities, exact filter on the unrounded ratio."""
    t = float(threshold)
    clks = clk_frame(canon, id_col=id_col, text_col=text_col, qgram=qgram)
    long = clks.select("doc_id", "card", F.explode("clk").alias("pos"))
    a = long.alias("a")
    b = long.alias("b")
    # Conservative length prune: max achievable dice is
    # 2*min(ca,cb)/(ca+cb); the -1e-9 slack only ever ADMITS extra
    # candidates (exact verify below removes them), never drops one.
    cand = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                2.0 * F.least(F.col("a.card"), F.col("b.card"))
                >= t * (F.col("a.card") + F.col("b.card")) - 1e-9
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    ca = clks.select(F.col("doc_id").alias("doc_id_a"), F.col("card").alias("card_a"))
    cb = clks.select(F.col("doc_id").alias("doc_id_b"), F.col("card").alias("card_b"))
    dice = (2.0 * F.col("shared")) / (F.col("card_a") + F.col("card_b"))
    return (
        cand.join(ca, "doc_id_a")
        .join(cb, "doc_id_b")
        .filter(dice >= t)
        .select("doc_id_a", "doc_id_b", F.round(dice, 6).alias("dice"))
    )


def hlsh_table_indices(n_tables: int = 8, bits_per_key: int = 12) -> list[list[int]]:
    """Deterministic per-table CLK bit-index subsets (Lehmer stream
    seeded per table — the ann.py plane-sign trick). Computed in plain
    Python so the Spark operator and the DuckDB twin key on the SAME
    literal indices."""
    tables = []
    for q in range(n_tables):
        seed = (q * 2654435761 + 0x9E3779B9) % PPRL_M
        idxs = []
        s = seed if seed > 0 else 1
        for _ in range(bits_per_key):
            s = (s * 48271) % PPRL_M  # Lehmer / Park-Miller step
            idxs.append(s % CLK_BITS)
        tables.append(idxs)
    return tables


def hlsh_blocks(
    clks: DataFrame, n_tables: int = 8, bits_per_key: int = 12
) -> DataFrame:
    """Hamming-LSH blocking over CLKs for planet-scale inputs:
    (doc_id, clk) -> (table, block_key, doc_id). Each table samples a
    deterministic subset of bit INDICES and keys each record by the
    membership pattern of its CLK on that subset. Similar CLKs collide
    in >= 1 table with high probability; candidates are then
    exact-verified with dice. Probabilistic (recall < 1 possible) —
    pytest measures recall vs `dice_pairs`; the exact join above stays
    the definitional path."""
    idx_cols = []
    for q, idxs in enumerate(hlsh_table_indices(n_tables, bits_per_key)):
        key = F.concat_ws(
            "",
            *[
                F.when(
                    F.array_contains("clk", F.lit(i).cast("long")), F.lit("1")
                ).otherwise(F.lit("0"))
                for i in idxs
            ],
        )
        idx_cols.append(
            clks.select(
                F.lit(q).alias("table"), key.alias("block_key"), "doc_id"
            )
        )
    out = idx_cols[0]
    for frame in idx_cols[1:]:
        out = out.unionByName(frame)
    return out


def hlsh_dice_pairs(
    canon: DataFrame,
    threshold: float = 0.8,
    n_tables: int = 8,
    bits_per_key: int = 12,
    id_col: str = "doc_id",
    text_col: str = "doc_text",
    qgram: int | None = None,
) -> DataFrame:
    """Bucket-then-verify Dice join: HLSH candidates (bare id pairs,
    deduped across tables BEFORE any payload joins in), then exact
    shared-bit count via array_intersect on the two CLKs."""
    t = float(threshold)
    clks = clk_frame(canon, id_col=id_col, text_col=text_col, qgram=qgram)
    blocks = hlsh_blocks(clks, n_tables, bits_per_key)
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    sa = clks.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("clk").alias("clk_a"),
        F.col("card").alias("card_a"),
    )
    sb = clks.select(
        F.col("doc_id").alias("doc_id_b"),
        F.col("clk").alias("clk_b"),
        F.col("card").alias("card_b"),
    )
    shared = F.size(F.array_intersect("clk_a", "clk_b"))
    dice = (2.0 * shared) / (F.col("card_a") + F.col("card_b"))
    return (
        cand.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .filter(dice >= t)
        .select("doc_id_a", "doc_id_b", F.round(dice, 6).alias("dice"))
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

def _horner_sql(tok: str, base: int) -> str:
    return portable_hash.horner_sql(tok, base, PPRL_M)


def clk_cte_sql(
    canon_rel: str = "canon",
    bits: int = CLK_BITS,
    k: int = CLK_K,
    id_col: str = "doc_id",
    text_col: str = "doc_text",
    qgram: int | None = None,
) -> str:
    """CTE body producing clks(doc_id, clk BIGINT[], card) — identical
    double-hash arithmetic to `clk_encode` (word or q-gram tokens)."""
    h1 = _horner_sql("t", PPRL_B1)
    h2 = _horner_sql("t", PPRL_B2)
    if qgram is not None:
        toks = (
            f"list_distinct(list_filter(list_transform("
            f"range(1, greatest(length({text_col}) - {qgram - 1}, 1) + 1), "
            f"j -> substr({text_col}, j, {qgram})), x -> x <> ''))"
        )
    else:
        toks = (
            f"list_distinct(list_filter(string_split({text_col}, ' '), x -> x <> ''))"
        )
    return (
        f"ts AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {canon_rel}), "
        "clks AS (SELECT doc_id, clk, len(clk) AS card FROM ("
        "SELECT doc_id, list_sort(list_distinct(flatten(list_transform(toks, t -> "
        f"list_transform(range(0, {k}), i -> ({h1} + i * {h2}) % {bits}))))) AS clk "
        "FROM ts) WHERE len(clk) > 0) "
    )


def dice_pairs_sql(
    threshold: float = 0.8,
    canon_rel: str = "canon",
    extra_ctes: str = "",
    id_col: str = "doc_id",
    text_col: str = "doc_text",
    qgram: int | None = None,
) -> str:
    """Twin of `dice_pairs` — exhaustive all-pairs Dice over recomputed
    CLKs (the oracle is the definition; the index join must reproduce
    it exactly). `extra_ctes` (e.g. the canon CTE) is spliced in first."""
    t = float(threshold)
    pre = f"{extra_ctes}, " if extra_ctes else ""
    clk = clk_cte_sql(canon_rel, id_col=id_col, text_col=text_col, qgram=qgram)
    return (
        f"WITH {pre}{clk} "
        "SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, "
        "round(2.0 * len(list_intersect(a.clk, b.clk)) / (a.card + b.card), 6) AS dice "
        "FROM clks a JOIN clks b ON a.doc_id < b.doc_id "
        "WHERE a.card > 0 AND b.card > 0 "
        f"AND 2.0 * len(list_intersect(a.clk, b.clk)) / (a.card + b.card) >= {t}"
    )


def hlsh_dice_pairs_sql(
    threshold: float = 0.8,
    n_tables: int = 8,
    bits_per_key: int = 12,
    canon_rel: str = "canon",
    extra_ctes: str = "",
    id_col: str = "doc_id",
    text_col: str = "doc_text",
    qgram: int | None = None,
) -> str:
    """Twin of `hlsh_dice_pairs` — recomputes the SAME deterministic
    bucket keys (literal index lists from `hlsh_table_indices`), the
    distinct candidate set, and the exact dice verify, so the full
    bucket-then-verify scale path is value-hash-checked end-to-end."""
    t = float(threshold)
    parts = []
    for q, idxs in enumerate(hlsh_table_indices(n_tables, bits_per_key)):
        key = " || ".join(
            f"CASE WHEN list_contains(clk, CAST({i} AS BIGINT)) THEN '1' ELSE '0' END"
            for i in idxs
        )
        parts.append(f"SELECT {q} AS tbl, {key} AS block_key, doc_id FROM clks")
    blocks = " UNION ALL ".join(parts)
    pre = f"{extra_ctes}, " if extra_ctes else ""
    clk = clk_cte_sql(canon_rel, id_col=id_col, text_col=text_col, qgram=qgram)
    return (
        f"WITH {pre}{clk}, blocks AS ({blocks}), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b "
        "FROM blocks a JOIN blocks b ON a.tbl = b.tbl AND a.block_key = b.block_key "
        "AND a.doc_id < b.doc_id) "
        "SELECT c.doc_id_a, c.doc_id_b, "
        "round(2.0 * len(list_intersect(ca.clk, cb.clk)) / (ca.card + cb.card), 6) AS dice "
        "FROM cand c JOIN clks ca ON ca.doc_id = c.doc_id_a "
        "JOIN clks cb ON cb.doc_id = c.doc_id_b "
        f"WHERE 2.0 * len(list_intersect(ca.clk, cb.clk)) / (ca.card + cb.card) >= {t}"
    )
