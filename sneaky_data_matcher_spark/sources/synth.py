"""Deterministic synthetic labeled record-linkage corpus (FIXTURES.md §1-2).

Generates, at small test scale, an interleaved text+media document corpus
with known duplicate groups, adversarial near-misses, and one hot block —
plus the labeled pairs ground truth for pairwise-F1 evaluation. Driver-side
generation is fine here: this is test/bench input only (at production scale
the corpus arrives as an Iceberg table; see sources/io.py).

Generation rules (seed fixed, no wall-clock):
  - ~60% unique entities, ~40% in duplicate groups of size 2-6.
  - Duplicates perturb text with case flips, doubled whitespace, wrapping
    quotes, <=2-char typos per sampled token, token reorder across span
    boundaries; media spans keep their media_ref with p=0.8.
  - 5-10% adversarial near-misses sharing a token prefix or one media_ref.
  - One hot block: ~20% of docs share the leading token "acme".
"""

from __future__ import annotations

import random
import string

from pyspark.sql import DataFrame, SparkSession

from .spans import SPAN_SCHEMA

_VOCAB_SIZE = 400
_WORD_LEN = (3, 9)


def _vocab(rng: random.Random) -> list[str]:
    words = set()
    while len(words) < _VOCAB_SIZE:
        n = rng.randint(*_WORD_LEN)
        words.add("".join(rng.choice(string.ascii_lowercase) for _ in range(n)))
    return sorted(words)


def _typo(rng: random.Random, word: str) -> str:
    if len(word) < 2:
        return word
    ops = rng.randint(1, 2)
    w = list(word)
    for _ in range(ops):
        kind = rng.choice(["sub", "del", "ins", "swap"])
        i = rng.randrange(len(w))
        if kind == "sub":
            w[i] = rng.choice(string.ascii_lowercase)
        elif kind == "del" and len(w) > 2:
            del w[i]
        elif kind == "ins":
            w.insert(i, rng.choice(string.ascii_lowercase))
        elif kind == "swap" and i + 1 < len(w):
            w[i], w[i + 1] = w[i + 1], w[i]
    return "".join(w)


def _perturb_tokens(rng: random.Random, tokens: list[str]) -> list[str]:
    out = list(tokens)
    # 1-2 char typos on up to 20% of tokens
    for i in rng.sample(range(len(out)), max(1, len(out) // 5)):
        out[i] = _typo(rng, out[i])
    # case flips
    for i in rng.sample(range(len(out)), max(1, len(out) // 6)):
        out[i] = out[i].upper() if rng.random() < 0.5 else out[i].capitalize()
    # wrapping quotes
    for i in rng.sample(range(len(out)), max(1, len(out) // 8)):
        q = rng.choice(["'", '"'])
        out[i] = f"{q}{out[i]}{q}"
    # local token reorder (swap two adjacent tokens, may cross span bounds)
    if len(out) > 3 and rng.random() < 0.7:
        i = rng.randrange(len(out) - 1)
        out[i], out[i + 1] = out[i + 1], out[i]
    return out


def _spans_from_tokens(
    rng: random.Random, tokens: list[str], media_refs: list[str], chunk: int = 8
) -> list[tuple[str, str | None, str | None, int]]:
    spans: list[tuple[str, str | None, str | None, int]] = []
    offset = 0
    mi = 0
    for start in range(0, len(tokens), chunk):
        sep = "  " if rng.random() < 0.15 else " "  # doubled whitespace noise
        spans.append(("text", sep.join(tokens[start : start + chunk]), None, offset))
        offset += 1
        # interleave media spans between text chunks
        if mi < len(media_refs) and rng.random() < 0.6:
            kind = rng.choice(["image", "audio", "video"])
            spans.append((kind, None, media_refs[mi], offset))
            offset += 1
            mi += 1
    while mi < len(media_refs):
        kind = rng.choice(["image", "audio", "video"])
        spans.append((kind, None, media_refs[mi], offset))
        offset += 1
        mi += 1
    return spans


def generate_corpus(
    spark: SparkSession, n_docs: int = 1000, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Returns (documents, labeled_pairs).

    documents:    doc_id string, spans (SPAN_SCHEMA), entity_id string (truth)
    labeled_pairs: doc_id_a, doc_id_b (a<b), is_match boolean
    """
    rng = random.Random(seed)
    vocab = _vocab(rng)

    rows = []  # (doc_id, spans, entity_id)
    positives: list[tuple[str, str]] = []
    entity_count = 0
    doc_count = 0
    entities: list[dict] = []  # for negative sampling / adversarial

    def new_doc_id() -> str:
        nonlocal doc_count
        did = f"doc_{doc_count:06d}"
        doc_count += 1
        return did

    while doc_count < n_docs:
        entity_id = f"ent_{entity_count:06d}"
        entity_count += 1
        n_tokens = rng.randint(10, 40)
        base_tokens = [rng.choice(vocab) for _ in range(n_tokens)]
        hot = rng.random() < 0.20
        if hot:
            base_tokens[0] = "acme"
        n_media = rng.randint(0, 2)
        base_media = [
            f"m:{rng.getrandbits(64):016x}" for _ in range(n_media)
        ]
        dup_group = rng.random() < 0.40
        group_size = rng.randint(2, 6) if dup_group else 1
        group_ids = []
        for k in range(group_size):
            if doc_count >= n_docs:
                break
            did = new_doc_id()
            if k == 0:
                toks, media = base_tokens, base_media
            else:
                toks = _perturb_tokens(rng, base_tokens)
                media = [
                    m if rng.random() < 0.8 else f"m:{rng.getrandbits(64):016x}"
                    for m in base_media
                ]
            rows.append((did, _spans_from_tokens(rng, toks, media), entity_id))
            group_ids.append(did)
        for i in range(len(group_ids)):
            for j in range(i + 1, len(group_ids)):
                a, b = sorted((group_ids[i], group_ids[j]))
                positives.append((a, b))
        entities.append(
            {"tokens": base_tokens, "media": base_media, "ids": group_ids, "hot": hot}
        )

    # adversarial near-misses: ~7% extra docs sharing a token prefix or one
    # media_ref with an existing entity but a different underlying entity
    n_adv = max(1, int(n_docs * 0.07))
    adversarial_ids = []
    for _ in range(n_adv):
        src = rng.choice(entities)
        entity_id = f"ent_{entity_count:06d}"
        entity_count += 1
        n_tokens = rng.randint(10, 40)
        toks = [rng.choice(vocab) for _ in range(n_tokens)]
        media: list[str] = []
        if rng.random() < 0.5:
            # share the leading tokens (prefix collision in sorted order)
            toks[: min(3, len(src["tokens"]))] = src["tokens"][:3]
        elif src["media"]:
            media = [rng.choice(src["media"])]
        did = new_doc_id()
        rows.append((did, _spans_from_tokens(rng, toks, media), entity_id))
        adversarial_ids.append((did, src["ids"]))

    # negatives: all adversarial x their source group + random cross-entity
    negatives: set[tuple[str, str]] = set()
    for did, src_ids in adversarial_ids:
        for sid in src_ids:
            negatives.add(tuple(sorted((did, sid))))
    all_ids = [r[0] for r in rows]
    pos_set = set(positives)
    while len(negatives) < len(positives) * 2 + len(adversarial_ids):
        a, b = rng.sample(all_ids, 2)
        p = tuple(sorted((a, b)))
        if p not in pos_set:
            negatives.add(p)

    docs = spark.createDataFrame(
        rows, schema=f"doc_id string, spans {SPAN_SCHEMA}, entity_id string"
    )
    pairs = spark.createDataFrame(
        [(a, b, True) for a, b in sorted(pos_set)]
        + [(a, b, False) for a, b in sorted(negatives)],
        schema="doc_id_a string, doc_id_b string, is_match boolean",
    )
    return docs, pairs
