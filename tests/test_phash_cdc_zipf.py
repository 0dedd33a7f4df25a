"""Perceptual hash, content-defined chunking, Zipf exponent."""

import hashlib
import math
import re

from incubator_hugegraph_computer_spark.functions.multimodal import (
    media_from_documents,
    perceptual_hash,
)
from incubator_hugegraph_computer_spark.functions.text import cdc_chunks, zipf_alpha

DOCS = [
    (1, "aaaa bbbb zzzz aaaa cccc dddd aaaa bbbb eeee ffff gggg aaaa"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "zz"),
]


def _phash_py(text, bits=63):
    b = text.encode()
    n = len(b)
    if n == 0:
        return 0
    gmean = sum(b) / n
    sums = [0] * bits
    cnts = [0] * bits
    for i, v in enumerate(b):
        k = i * bits // n
        sums[k] += v
        cnts[k] += 1
    h = 0
    for k in range(bits):
        if cnts[k] > 0 and sums[k] / cnts[k] > gmean:
            h |= 1 << k
    return h


def test_perceptual_hash_matches_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["media_id"]: (r["n_bytes"], r["phash"]) for r in
           perceptual_hash(media_from_documents(docs)).collect()}
    for did, text in DOCS:
        assert got[did] == (len(text), _phash_py(text)), did


def test_cdc_chunks_match_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_len"], r["chunk_md5"])
        for r in cdc_chunks(docs, window=8).collect()
    }
    exp = {}
    for did, text in DOCS:
        n = len(text)
        cid = 0
        start = 1
        chunks = []
        for p in range(1, n + 1):
            ib = (
                p >= 2
                and p <= n - 7
                and hashlib.md5(text[p - 1 : p + 7].encode()).hexdigest()[0] == "0"
            )
            if ib:
                chunks.append((cid, start, p - 1))
                cid += 1
                start = p
        chunks.append((cid, start, n))
        for cid_, s, e in chunks:
            seg = text[s - 1 : e]
            exp[(did, cid_)] = (len(seg), hashlib.md5(seg.encode()).hexdigest())
    assert got == exp


def test_zipf_alpha_matches_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    row = zipf_alpha(docs, fmin=2).collect()[0]
    toks = [
        t
        for _, text in DOCS
        for t in re.split(r"[^a-z0-9]+", text.lower())
        if t
    ]
    tf = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    tail = [f for f in tf.values() if f >= 2]
    alpha = 1.0 + len(tail) / sum(math.log(f / 1.5) for f in tail)
    assert row["n_tail"] == len(tail)
    assert abs(row["alpha"] - round(alpha, 6)) < 2e-6
