#!/usr/bin/env python3
"""Synthesize a perf-only scaled replica of a driver fixture directory.

Usage: python3 tools/make_scaled.py <srcDir> <dstDir> <copies> \
           [salt[:MOD] | long[:MIN-MAX] | longsalt[:MOD]] [onlyTable,...]

Replicates every table <copies> times with key columns shifted by a
large per-copy offset so join integrity is preserved (facts reference
the shifted dimension copies; nation/region stay shared). Schemas are
preserved bit-for-bit via pyarrow — events.ts stays parquet
TIMESTAMP(NANOS), which graft.Tables special-cases.

With the optional 4th arg `salt`, document texts and embedding vectors
are perturbed per copy so replicas are NOT near-duplicates of their
originals: a plain clone gives every doc 9 exact siblings, so near-dup
output grows quadratically in copies and alpha measures output volume,
not plan scaling. Salting keeps a bounded ~5% per-copy near-dup rate
((id + copy) % 20 == 0: light perturbation that stays over the
Jaccard/cosine thresholds) and makes the other 95% genuinely distinct
(every 3rd token replaced with copy-specific junk -> no 3-gram shingle
survives; embeddings get 4x-relative-norm noise -> cosine ~0.24, below
the 0.3 gates). Copy 0 is always byte-identical to the source.

NOT part of the engine and NOT an oracle input: the output exists only
to measure per-query scaling exponents (BENCHNOTES.md). Dev tooling,
driver-side libs only.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 10_000_000  # larger than any key at the source SF

# key columns to shift per copy, per table (dims region/nation shared)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}


NEARDUP_MOD = 20  # 1/MOD of each copy stays a near-dup (salt:MOD dial)


def keep_neardup(ids, c):
    """1/NEARDUP_MOD of each copy stays a true near-dup of its source
    doc (default 5%; `salt:4` -> 25% for the d02 payoff-regime probe)."""
    return (ids + c) % NEARDUP_MOD == 0


def salt_documents(t, c):
    """Perturb text per copy: keep-set appends two tokens (shingle set
    nearly intact, 40-char d08 prefix untouched); the rest replace every
    3rd token with copy-specific junk (no 3-gram survives, prefix
    broken)."""
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    keep = keep_neardup(ids, c)
    out = []
    for i, s in enumerate(texts):
        if s is None:
            out.append(None)
        elif keep[i]:
            out.append(s + f" nd{c} copy")
        else:
            toks = s.split(" ")
            for j in range(2, len(toks), 3):
                # doc-specific junk: a copy-only token (zq{c}t{j}) is
                # SHARED by every doc in the copy, so 40-char prefixes
                # collide across docs and the d08 segment join explodes
                # on an artifact of the salt, not the data
                toks[j] = f"zq{c}d{ids[i] % 9973}t{j}"
            out.append(" ".join(toks))
    idx = t.schema.get_field_index("text")
    return t.set_column(idx, t.field("text"), pa.array(out, type=t.field("text").type))


LONG_MIN, LONG_MAX = 200, 1000  # long-doc token range (long:MIN-MAX dial)
LONG_VOCAB = 30_000             # synthetic tail vocabulary size
LONG_ZIPF_S = 1.07              # Zipf exponent -> realistic df skew


def long_documents(t, c):
    """Long-doc mode (r17, verdict ask #2): extend every doc's text to
    a target length drawn uniformly from [LONG_MIN, LONG_MAX] tokens by
    APPENDING a Zipf-sampled synthetic tail (vocab `zl0..zlN`, p ~
    1/rank^s) — the regime the BM25 index exists for (the r16-measured
    indexed/in-query crossover is TEXT LENGTH). Appending, not
    replacing, keeps the source vocabulary intact: probe terms keep
    their original document frequencies ('dup' stays rare, 'spark'
    stays corpus-common), while the tail adds realistic df skew (head
    tail-terms land in nearly every doc, deep-tail terms in a handful).
    Deterministic per copy (seeded rng; doc order within a copy is the
    source order). Applies to EVERY copy including copy 0 — the point
    is a uniformly long corpus, unlike salt's copy-0-identical rule."""
    rng = np.random.default_rng(7_000_003 * c + 13)
    texts = t.column("text").to_pylist()
    ranks = np.arange(1, LONG_VOCAB + 1, dtype=np.float64)
    p = ranks ** -LONG_ZIPF_S
    p /= p.sum()
    targets = rng.integers(LONG_MIN, LONG_MAX + 1, size=len(texts))
    out = []
    for i, s in enumerate(texts):
        if s is None:
            out.append(None)
            continue
        n0 = s.count(" ") + 1
        extra = int(targets[i]) - n0
        if extra <= 0:
            out.append(s)
            continue
        tail = rng.choice(LONG_VOCAB, size=extra, p=p)
        out.append(s + " " + " ".join(f"zl{k}" for k in tail))
    idx = t.schema.get_field_index("text")
    return t.set_column(idx, t.field("text"),
                        pa.array(out, type=t.field("text").type))


def make_tails(texts):
    """COPY-INDEPENDENT Zipf tails for longsalt mode: one tail per
    source row, reused by every copy — a keeper sibling (keep set) and
    its copy-0 original share the same tail, so their shingle sets stay
    nearly identical and J >= 0.5 SURVIVES at 600-token lengths (r19,
    verdict ask #2: the long replica priced construction but had zero
    qualifying pairs, so the verify stage ran on an empty candidate
    set)."""
    rng = np.random.default_rng(42_000_019)
    ranks = np.arange(1, LONG_VOCAB + 1, dtype=np.float64)
    p = ranks ** -LONG_ZIPF_S
    p /= p.sum()
    targets = rng.integers(LONG_MIN, LONG_MAX + 1, size=len(texts))
    tails = []
    for i, s in enumerate(texts):
        if s is None:
            tails.append(None)
            continue
        n0 = s.count(" ") + 1
        extra = int(targets[i]) - n0
        if extra <= 0:
            tails.append("")
            continue
        tail = rng.choice(LONG_VOCAB, size=extra, p=p)
        tails.append(" " + " ".join(f"zl{k}" for k in tail))
    return tails


def longsalt_documents(t, c, tails):
    """long + salt composed (r19, verdict ask #2): every doc extends to
    its fixed Zipf tail (same tail in every copy), then copy c > 0
    plants salt's bounded near-dup rate — the keep set appends two
    tokens to the SHARED long text (J ~ n/(n+2) vs the copy-0 long doc,
    comfortably over 0.5), the rest get every 3rd token of the LONG
    text replaced with doc-specific junk (no 3-gram survives)."""
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    keep = keep_neardup(ids, c)
    out = []
    for i, s in enumerate(texts):
        if s is None:
            out.append(None)
        else:
            base = s + tails[i]
            if c == 0:
                out.append(base)
            elif keep[i]:
                out.append(base + f" nd{c} copy")
            else:
                toks = base.split(" ")
                for j in range(2, len(toks), 3):
                    toks[j] = f"zq{c}d{ids[i] % 9973}t{j}"
                out.append(" ".join(toks))
    idx = t.schema.get_field_index("text")
    return t.set_column(idx, t.field("text"),
                        pa.array(out, type=t.field("text").type))


def salt_embeddings(t, c):
    """Jitter vectors per copy: keep-set gets 2%-relative noise (cosine
    ~0.9998, stays over every gate); the rest 10x-relative noise
    (cosine ~0.1 mean — at 64 dims the distribution is wide, so a
    smaller amp leaves a third of copies over the 0.3 gates).
    Deterministic per (copy)."""
    ids = t.column("vec_id").to_numpy()
    vecs = t.column("embedding").to_pylist()
    keep = keep_neardup(ids, c)
    rng = np.random.default_rng(1000003 * c + 17)
    out = []
    for i, v in enumerate(vecs):
        if v is None:
            out.append(None)
            continue
        a = np.asarray(v, dtype=np.float64)
        noise = rng.standard_normal(a.shape)
        nn = np.linalg.norm(noise)
        amp = 0.02 if keep[i] else 10.0
        if nn > 0 and np.linalg.norm(a) > 0:
            a = a + amp * (np.linalg.norm(a) / nn) * noise
        out.append(a.astype(np.float32))
    idx = t.schema.get_field_index("embedding")
    return t.set_column(idx, t.field("embedding"),
                        pa.array([x if x is None else list(x) for x in out],
                                 type=t.field("embedding").type))


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    longsalt = len(sys.argv) > 4 and sys.argv[4].startswith("longsalt")
    salt = len(sys.argv) > 4 and sys.argv[4].startswith("salt")
    long_mode = (len(sys.argv) > 4 and sys.argv[4].startswith("long")
                 and not longsalt)
    if (salt or longsalt) and ":" in sys.argv[4]:
        global NEARDUP_MOD
        NEARDUP_MOD = int(sys.argv[4].split(":", 1)[1])
    if long_mode and ":" in sys.argv[4]:
        global LONG_MIN, LONG_MAX
        LONG_MIN, LONG_MAX = map(int, sys.argv[4].split(":", 1)[1].split("-"))
    tails = None
    only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
    import os
    os.makedirs(dst, exist_ok=True)
    if only is not None:
        # ADVICE r13: a partial regeneration into an existing dst can mix
        # tables generated under different args (e.g. another salt:MOD)
        # with no trace — make the skip visible so stale fixture dirs are
        # diagnosable.
        skipped = sorted(set(SHIFT) - only)
        if skipped:
            print(f"NOTE: --only leaves {len(skipped)} table(s) untouched in "
                  f"{dst}: {', '.join(skipped)} (regenerate them too if args "
                  f"changed, or stale mixes will go unnoticed)")
    for table, keys in SHIFT.items():
        if only is not None and table not in only:
            continue
        t = pq.read_table(f"{src}/{table}.parquet")
        if not keys:  # shared dims: single copy
            pq.write_table(t, f"{dst}/{table}.parquet")
            print(f"{table}: {t.num_rows} rows (shared dim)")
            continue
        # row-group layout (r12): the default writer put ALL rows in ONE
        # row group, and a parquet row group is the unit of scan
        # parallelism — Spark assigned 18 splits but only the one
        # containing the row-group midpoint had data, so every
        # documents/embeddings scan at 100x ran ONE task (x04's "25 s"
        # was a single core tokenizing 500k docs while 31 idled). A real
        # 100 TB table is thousands of files x row groups; ~64 groups
        # per table makes the replica's scan parallelism realistic.
        rg = max(4096, (t.num_rows * copies) // 64)
        parts = []
        for c in range(copies):
            shifted = t
            for k in keys:
                col = shifted.column(k)
                newcol = pc.add(col, pa.scalar(c * OFF, type=col.type))
                shifted = shifted.set_column(
                    shifted.schema.get_field_index(k), shifted.field(k), newcol)
            if salt and c > 0 and table == "documents":
                shifted = salt_documents(shifted, c)
            if (salt or longsalt) and c > 0 and table == "embeddings":
                shifted = salt_embeddings(shifted, c)
            if long_mode and table == "documents":
                shifted = long_documents(shifted, c)
            if longsalt and table == "documents":
                if tails is None:
                    tails = make_tails(t.column("text").to_pylist())
                shifted = longsalt_documents(shifted, c, tails)
            parts.append(shifted)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{table}.parquet", row_group_size=rg)
        print(f"{table}: {t.num_rows} -> {out.num_rows} rows "
              f"({(out.num_rows + rg - 1) // rg} row groups)")


if __name__ == "__main__":
    main()
