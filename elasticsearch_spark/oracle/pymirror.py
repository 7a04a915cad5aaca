"""Independent pure-Python mirrors backing the VALUES oracles.

The hash-family pipeline entries (minhash/simhash LSH dedup, hyperplane
embedding buckets, IVF probe search) and the binary media entries cannot be
expressed in DuckDB SQL — DuckDB has no xxhash64 and no codecs. This module
re-implements each operator's *semantics* from first principles (the
published algorithms: xxHash64 spec, Broder 1997 minhash, Charikar 2002
simhash, multi-probe LSH, Porter 1980, Lucene SmallFloat byte315) so the
registry can emit literal ``VALUES`` tables as oracles: two independently
written implementations must agree row-for-row.

Deliberately shares NO code with the engine package beyond the stdlib /
numpy: its own tokenizers, its own Porter stemmer, its own byte315
quantizer, its own xxHash64. Arithmetic mirrors Spark's SQL type promotion
(float32 vs float64 fold order) exactly where the engine relies on it —
those spots are commented.

Reference points (for parity-checking, not ports):
/root/reference/src/main/java/org/elasticsearch/common/hashing/ (murmur
analog), org/elasticsearch/index/mapper/core/BinaryFieldMapper.java.
"""

from __future__ import annotations

import io
import math
import re
import struct
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

# ---------------------------------------------------------------------------
# xxHash64 — from the public xxHash spec (Yann Collet), the same algorithm
# Spark's `xxhash64` SQL function implements. Seed handling mirrors Spark:
# running hash of column i seeds column i+1; initial seed 42.
# ---------------------------------------------------------------------------

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_long(v: int, seed: int) -> int:
    """XXH64 of one 64-bit lane (Spark hashes LongType values this way)."""
    v &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    return _fmix(h)


def xxh64_int(v: int, seed: int) -> int:
    """XXH64 of one 32-bit lane (Spark hashes Int/Short/Byte/Bool this way)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M
    h = ((_rotl(h, 23) * _P2) + _P3) & _M
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Full streaming XXH64 over a byte buffer (StringType path)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for off, acc in enumerate((v1, v2, v3, v4)):
                lane = struct.unpack_from("<Q", data, i + off * 8)[0]
                acc = (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M
                if off == 0:
                    v1 = acc
                elif off == 1:
                    v2 = acc
                elif off == 2:
                    v3 = acc
                else:
                    v4 = acc
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for acc in (v1, v2, v3, v4):
            h ^= (_rotl((acc * _P2) & _M, 31) * _P1) & _M
            h = ((h * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        lane = struct.unpack_from("<Q", data, i)[0]
        h ^= (_rotl((lane * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        lane = struct.unpack_from("<I", data, i)[0]
        h ^= (lane * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*vals) -> int:
    """Mirror of `F.xxhash64(...)`: chain-seeded, returns SIGNED 64-bit.

    Values are tagged by Spark SQL type: ('str', s) | ('int', i) |
    ('long', l). Spark seeds with 42 and threads the running hash as the
    seed of the next column.
    """
    h = 42
    for kind, v in vals:
        if kind == "str":
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif kind == "int":
            h = xxh64_int(int(v), h)
        elif kind == "long":
            h = xxh64_long(int(v), h)
        else:
            raise ValueError(kind)
    return _signed(h)


# ---------------------------------------------------------------------------
# Spark-compatible rounding / tokenizing helpers
# ---------------------------------------------------------------------------


def spark_round(x: float, d: int) -> float:
    """Mirror of `F.round(double, d)`: Java BigDecimal.valueOf(double)
    (shortest round-trip decimal, i.e. repr()) with HALF_UP."""
    if x != x or x in (float("inf"), float("-inf")):
        return x
    q = Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-d), rounding=ROUND_HALF_UP
    )
    return float(q)


# Java regex \s is ASCII-only — Spark's split(text, '\\s+') does NOT split
# on unicode spaces, unlike Python's str \s. Mirror the Java class exactly.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_SIMPLE = re.compile(r"[a-z0-9]+")


def java_ws_split(text: str) -> list[str]:
    return [t for t in _JAVA_WS.split(text) if t != ""]


def simple_tokens(text: str) -> list[str]:
    """The 'simple' analyzer contract: maximal [a-z0-9]+ runs of lower()."""
    if text is None:
        return []
    return _SIMPLE.findall(text.lower())


# ---------------------------------------------------------------------------
# Porter stemmer — independently written from M.F. Porter, "An algorithm
# for suffix stripping" (Program 14(3), 1980). Table-driven, deliberately
# structured differently from analysis/filters.py so the two cannot share
# a bug by construction.
# ---------------------------------------------------------------------------


def _p_form(word: str) -> str:
    """Classify each letter as 'c' or 'v' per Porter's definition
    (y is a vowel iff preceded by a consonant)."""
    out = []
    for i, ch in enumerate(word):
        if ch in "aeiou":
            out.append("v")
        elif ch == "y":
            out.append("v" if i > 0 and out[i - 1] == "c" else "c")
        else:
            out.append("c")
    return "".join(out)


def _p_m(word: str) -> int:
    """The measure m: number of 'vc' transitions in the c/v form."""
    return len(re.findall(r"v+c", _p_form(word)))


def _p_vowel(word: str) -> bool:
    return "v" in _p_form(word)


def _p_dbl(word: str) -> bool:
    return len(word) >= 2 and word[-1] == word[-2] and _p_form(word)[-1] == "c"


def _p_cvc(word: str) -> bool:
    return (
        len(word) >= 3
        and _p_form(word)[-3:] == "cvc"
        and word[-1] not in "wxy"
    )


def porter_stem_mirror(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    for suf, rep in (("sses", "ss"), ("ies", "i"), ("ss", "ss"), ("s", "")):
        if w.endswith(suf):
            w = w[: -len(suf)] + rep
            break
    # step 1b
    if w.endswith("eed"):
        if _p_m(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = None
        for suf in ("ed", "ing"):
            if w.endswith(suf) and _p_vowel(w[: -len(suf)]):
                hit = w[: -len(suf)]
                break
        if hit is not None:
            w = hit
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _p_dbl(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _p_m(w) == 1 and _p_cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _p_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2 (m>0 condition on the stem)
    step2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
        ("iviti", "ive"), ("biliti", "ble"),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            if _p_m(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    step3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )
    for suf, rep in step3:
        if w.endswith(suf):
            if _p_m(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4 (m>1)
    step4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    )
    for suf in sorted(step4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and (not stem or stem[-1] not in "st"):
                break
            if _p_m(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _p_m(w[:-1])
        if m > 1 or (m == 1 and not _p_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _p_m(w) > 1 and _p_dbl(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Lucene byte315 norm quantization (SmallFloat.floatToByte315 round trip) —
# re-derived from the published Lucene algorithm, independent of
# functions/smallfloat.py.
# ---------------------------------------------------------------------------


def byte315_roundtrip(x: float) -> float:
    """floatToByte315 (3 mantissa bits, zero-exponent point 15) -> byte315ToFloat."""
    bits = struct.unpack("<I", struct.pack("<f", np.float32(x)))[0]
    small = bits >> 21  # unsigned >>> (24-3)
    if small <= ((63 - 15) << 3):
        b = 0 if (bits == 0 or bits >= 0x80000000) else 1  # (bits<=0) signed
    elif small >= ((63 - 15) << 3) + 0x100:
        b = 0xFF
    else:
        b = small - ((63 - 15) << 3)
    if b == 0:
        return 0.0
    dec = ((b & 0xFF) << 21) + ((63 - 15) << 24)
    return struct.unpack("<f", struct.pack("<I", dec))[0]


def effective_doc_len_mirror(dl: int) -> float:
    """Lucene BM25's norm pipeline: 1/sqrt(dl) -> byte315 -> 1/decode^2."""
    if dl <= 0:
        return 0.0
    norm = byte315_roundtrip(1.0 / math.sqrt(float(dl)))
    return 1.0 / (norm * norm)


# ---------------------------------------------------------------------------
# Stand-alone BM25 oracle (Lucene 5 formula) over the mirror analyzer chain
# ---------------------------------------------------------------------------


def bm25_topk_mirror(
    docs: list[tuple[int, str]],
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    stem: bool = False,
) -> list[tuple[int, float]]:
    """Multi-term OR BM25 top-k with DFS-global stats, mirror analysis."""
    tok = (
        (lambda t: [porter_stem_mirror(x) for x in simple_tokens(t)])
        if stem
        else simple_tokens
    )
    tfs: dict[int, Counter] = {}
    dls: dict[int, int] = {}
    total = 0
    for key, text in docs:
        toks = tok(text)
        tfs[key] = Counter(toks)
        dls[key] = len(toks)
        total += len(toks)
    n = len(docs)
    avgdl = total / n if n else 1.0
    qterms = list(dict.fromkeys(tok(query)))
    df = {t: sum(1 for c in tfs.values() if t in c) for t in qterms}
    scored = []
    for key in tfs:
        s = 0.0
        hit = False
        for t in qterms:
            tf = tfs[key].get(t, 0)
            if tf == 0:
                continue
            hit = True
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            dl_eff = effective_doc_len_mirror(dls[key])
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dl_eff / avgdl)
            )
        if hit:
            scored.append((key, s))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored[:k]


# ---------------------------------------------------------------------------
# MinHash / LSH dedup mirror (Broder 1997; Leskovec MMDS ch.3 banding)
# ---------------------------------------------------------------------------


def _shingle_set(text: str, n: int) -> list[str]:
    """Mirror of the engine's SQL shingler: substring(lower, i, n) for
    i in 1..max(len-n+1, 1), distinct (Spark substring truncates at end;
    for len<n this yields the single whole-text shingle)."""
    t = text.lower()
    upper = max(len(t) - n + 1, 1)
    seen: dict[str, None] = {}
    for i in range(upper):
        seen.setdefault(t[i : i + n], None)
    return list(seen)


def _xxh64_int_family(count: int, seed: int) -> np.ndarray:
    """Vectorized xxh64_int(i, seed) for i in 0..count-1 (uint64 wraparound
    arithmetic is exact in numpy) — equals the scalar chain bit-for-bit,
    asserted in tests/test_pymirror.py."""
    u = np.uint64
    i = np.arange(count, dtype=np.uint64)
    h = u((seed + _P5 + 4) & _M) ^ ((i & u(0xFFFFFFFF)) * u(_P1))
    h = ((h << u(23)) | (h >> u(41))) * u(_P2) + u(_P3)
    h ^= h >> u(33)
    h *= u(_P2)
    h ^= h >> u(29)
    h *= u(_P3)
    h ^= h >> u(32)
    return h.astype(np.int64)  # two's complement == Spark's signed long


_SHINGLE_FAMILY_CACHE: dict[tuple[str, int], np.ndarray] = {}


def minhash_signature(
    text: str, num_hashes: int = 64, shingle_size: int = 5
) -> list[int]:
    """[min_s xxh64(s, i) for i] — the shingle's string hash is computed
    once and the i-family derived from it (chain seeding: str then int,
    exactly F.xxhash64(shingle, lit(i)))."""
    sh = _shingle_set(text, shingle_size)
    rows = np.empty((len(sh), num_hashes), dtype=np.int64)
    for r, s in enumerate(sh):
        key = (s, num_hashes)
        fam = _SHINGLE_FAMILY_CACHE.get(key)
        if fam is None:
            fam = _xxh64_int_family(num_hashes, xxh64_bytes(s.encode("utf-8"), 42))
            _SHINGLE_FAMILY_CACHE[key] = fam
        rows[r] = fam
    return [int(v) for v in rows.min(axis=0)]


def minhash_keep_keys(
    docs: list[tuple[int, str]],
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 8,
    shingle_size: int = 5,
    max_bucket: int = 200,
    estimate_margin: float = 0.15,
) -> list[int]:
    """Full mirror of dedup.minhash_dedup: returns surviving keys."""
    rows_per_band = num_hashes // bands
    sigs = {k: minhash_signature(t, num_hashes, shingle_size) for k, t in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for k, sig in sigs.items():
        for band in range(bands):
            seg = sig[band * rows_per_band : (band + 1) * rows_per_band]
            bucket = spark_xxhash64(*[("long", v) for v in seg])
            buckets.setdefault((band, bucket), []).append(k)
    cand: set[tuple[int, int]] = set()
    for ks in buckets.values():
        if max_bucket is not None and len(ks) > max_bucket:
            continue
        ks = sorted(ks)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                cand.add((ks[i], ks[j]))
    shs = {k: set(_shingle_set(t, shingle_size)) for k, t in docs}
    losers: set[int] = set()
    for a, bkey in cand:
        sa, sb = sigs[a], sigs[bkey]
        est = sum(1 for x, y in zip(sa, sb) if x == y) / float(len(sa))
        if est < threshold - estimate_margin:
            continue
        jac = len(shs[a] & shs[bkey]) / float(len(shs[a] | shs[bkey]))
        if jac >= threshold:
            losers.add(bkey)
    return [k for k, _ in docs if k not in losers]


# ---------------------------------------------------------------------------
# SimHash mirror (Charikar 2002) + rotation-band near-dup pairs
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    votes = [0] * 64
    for tok in java_ws_split(text.lower()):
        h = spark_xxhash64(("str", tok)) & _M
        for bit in range(64):
            votes[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if votes[bit] > 0:
            out |= 1 << bit
    return _signed(out)


def simhash_pairs(
    docs: list[tuple[int, str]], hamming_radius: int = 3, tables: int = 4
) -> list[tuple[int, int, int]]:
    width = 64 // tables
    mask = (1 << width) - 1
    sigs = {k: simhash64(t) & _M for k, t in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for k, s in sigs.items():
        for t in range(tables):
            buckets.setdefault((t, (s >> (t * width)) & mask, ), []).append(k)
    cand: set[tuple[int, int]] = set()
    for ks in buckets.values():
        ks = sorted(ks)
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                cand.add((ks[i], ks[j]))
    out = []
    for a, b in sorted(cand):
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= hamming_radius:
            out.append((a, b, ham))
    return out


# ---------------------------------------------------------------------------
# Embedding hyperplane-LSH near-dup + IVF multi-probe top-k mirrors.
# Arithmetic mirrors Spark SQL type promotion bit-for-bit:
# - dedup normalization: y*y computed in FLOAT32 then widened into the
#   double fold (array<float> lambda: float*float -> float);
# - IVF cell / cosine: elements cast to double BEFORE multiply.
# Fold order is left-to-right in both engines (IEEE doubles associate
# identically given the same order).
# ---------------------------------------------------------------------------


def _plane_sign(i: int, p: int) -> float:
    return float((spark_xxhash64(("int", i), ("int", p)) & 1) * 2 - 1)


def embedding_cosine_pairs(
    embs: list[tuple[int, np.ndarray]],
    threshold: float = 0.95,
    bucket_bits: int = 8,
    decimals: int = 4,
) -> list[tuple[int, int, float]]:
    """Mirror of dedup.embedding_cosine_dups (normalize -> bucket -> verify)."""
    normed: dict[int, list[float]] = {}
    bucket: dict[int, int] = {}
    for key, vec in embs:
        v32 = np.asarray(vec, dtype=np.float32)
        acc = 0.0
        for y in v32:  # float32 square, double accumulate — as Spark does
            acc += float(np.float32(y) * np.float32(y))
        nrm = math.sqrt(acc)
        nv = [float(x) / nrm for x in v32]
        normed[key] = nv
        code = 0
        for p in range(bucket_bits):
            dot = 0.0
            for i, x in enumerate(nv):
                dot += x * _plane_sign(i, p)
            if dot > 0:
                code += 1 << p
        bucket[key] = code
    out = []
    keys = sorted(normed)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            if bucket[a] != bucket[b]:
                continue
            cos = 0.0
            for x, y in zip(normed[a], normed[b]):
                cos += x * y
            if cos >= threshold:
                out.append((a, b, spark_round(cos, decimals)))
    return out


def _ivf_cell(vec64: list[float], bits: int) -> int:
    code = 0
    for p in range(bits):
        dot = 0.0
        for i, x in enumerate(vec64):
            dot += x * _plane_sign(i, p)
        if dot > 0:
            code += 1 << p
    return code


def ivf_topk_mirror(
    embs: list[tuple[int, np.ndarray]],
    query_vec: list[float],
    k: int = 10,
    bits: int = 6,
    probe_hamming: int = 2,
    decimals: int = 4,
) -> list[tuple[int, float]]:
    """Mirror of similarity.ivf_topk / ivf_topk_indexed (identical result:
    the indexed path stores vectors unchanged and prunes by the same cell)."""
    q64 = [float(np.float32(x)) for x in query_vec]
    qcell = _ivf_cell(q64, bits)
    probes = {qcell}
    if probe_hamming >= 1:
        probes |= {qcell ^ (1 << b) for b in range(bits)}
    if probe_hamming >= 2:
        probes |= {
            qcell ^ (1 << b1) ^ (1 << b2)
            for b1 in range(bits)
            for b2 in range(b1 + 1, bits)
        }
    qnorm = math.sqrt(sum(x * x for x in q64)) or 1.0
    scored = []
    for key, vec in embs:
        v32 = np.asarray(vec, dtype=np.float32)
        v64 = [float(x) for x in v32]
        if _ivf_cell(v64, bits) not in probes:
            continue
        dot = 0.0
        vsq = 0.0
        for x, qx in zip(v64, q64):
            dot += x * qx
            vsq += x * x  # cast(x as double) * x — double product
        cos = dot / (math.sqrt(vsq) * qnorm)
        scored.append((key, spark_round(cos, decimals)))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored[:k]


# ---------------------------------------------------------------------------
# Multimodal mirrors: analytic sizes + independent PPM/RIFF parsers.
# Payload bytes are re-synthesized with numpy's published PCG64 generator
# (the fixture's determinism source — shared by spec, like the parquet
# fixture itself); the DECODE/stats side is parsed independently
# (manual header walk, no `wave` module).
# ---------------------------------------------------------------------------


def media_kind(key: int) -> str:
    return ("image", "audio", "video")[key % 3]


def media_n_bytes(key: int, text: str) -> int:
    kind = key % 3
    if kind == 0:
        w, h = 8 + key % 9, 6 + key % 7
        header = b"P6\n%d %d\n255\n" % (w, h)
        return len(header) + 3 * w * h
    if kind == 1:
        n = 800 + (key % 5) * 400
        return 44 + 2 * n  # canonical RIFF/WAVE PCM16 mono header is 44 B
    return len((text or "").encode())


def _ppm_pixels(key: int) -> np.ndarray:
    w, h = 8 + key % 9, 6 + key % 7
    rng = np.random.default_rng(key)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def image_stats(key: int, thumb: int = 4, decimals: int = 4):
    """(key, width, height, round(mean_r as float32 -> double, d))."""
    pix = _ppm_pixels(key)
    h, w = pix.shape[:2]
    mean_r = float(np.float32(pix.reshape(-1, 3).mean(axis=0)[0]))
    return key, w, h, spark_round(mean_r, decimals)


def _wav_pcm(key: int, rate: int = 8000) -> np.ndarray:
    n = 800 + (key % 5) * 400
    rng = np.random.default_rng(key)
    t = np.arange(n, dtype=np.float64)
    freq = 100.0 + (key % 17) * 50.0
    sig = 0.5 * np.sin(2 * np.pi * freq * t / rate) + 0.1 * rng.standard_normal(n)
    return np.clip(sig * 32767.0, -32768, 32767).astype("<i2")


def parse_riff_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """Independent WAV reader: manual RIFF chunk walk (no `wave` module)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            if fmt != 1 or ch != 1:
                raise ValueError("expected PCM mono")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, rate


def audio_stats(key: int, decimals: int = 4):
    """(key, n_samples, sample_rate, round(rms), round(peak)) — float32 cast
    mirrored before rounding (DECODED_AUDIO_SCHEMA stores float)."""
    pcm16 = _wav_pcm(key)
    pcm = pcm16.astype(np.float64) / 32768.0
    rms = float(np.float32(np.sqrt(np.mean(pcm**2)))) if pcm.size else 0.0
    peak = float(np.float32(np.abs(pcm).max())) if pcm.size else 0.0
    return key, int(pcm.size), 8000, spark_round(rms, decimals), spark_round(peak, decimals)


# ---------------------------------------------------------------------------
# Field-masking span_near oracle (FieldMaskingSpanQuery semantics over a
# text + text.stemmed sub-field pair; positions align because the mirror's
# Porter chain is 1:1 position-preserving, same contract as the engine)
# ---------------------------------------------------------------------------


def masked_span_near_mirror(
    docs: list[tuple[int, str]],
    clauses: list[tuple[str, str]],
    slop: int = 0,
    in_order: bool = True,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[tuple[int, float]]:
    """span_near over ("main"|"masked", term) clauses, the masked field
    being the porter-stemmed view of the same token stream. freq = count
    of anchor positions completing a greedy ordered chain (or unordered
    pair) through the per-clause position lists; idf per clause term from
    its OWN field's document frequencies; tfNorm from the shared doc
    length. Mirrors query/spans.py field_masking_span_near_topk with zero
    shared analysis code."""
    if not in_order and len(clauses) != 2:
        raise ValueError("unordered supports exactly 2 clauses")
    qterms = []  # analyzed per clause, by its own field's chain
    for fld, word in clauses:
        t = simple_tokens(word)
        t = t[0] if t else ""
        if fld == "masked":
            t = porter_stem_mirror(t)
        qterms.append((fld, t))
    streams: dict[int, dict[str, list[str]]] = {}
    dls: dict[int, int] = {}
    total = 0
    for key, text in docs:
        raw = simple_tokens(text)
        streams[key] = {"main": raw,
                        "masked": [porter_stem_mirror(x) for x in raw]}
        dls[key] = len(raw)
        total += len(raw)
    n = len(docs)
    avgdl = total / n if n else 1.0
    dfs = {
        (fld, t): sum(1 for s in streams.values() if t in s[fld])
        for fld, t in set(qterms)
    }
    sum_idf = sum(
        math.log(1.0 + (n - dfs[key_] + 0.5) / (dfs[key_] + 0.5))
        for key_ in dict.fromkeys(qterms)
    )
    scored = []
    for key in streams:
        pos_lists = [
            [p for p, tok in enumerate(streams[key][fld], start=1) if tok == t]
            for fld, t in qterms
        ]
        if any(not pl for pl in pos_lists):
            continue
        freq = 0
        if in_order:
            nq = len(qterms)
            for p in pos_lists[0]:
                cur = p
                ok = True
                for pl in pos_lists[1:]:
                    nxt = next((q for q in pl if q > cur), None)
                    if nxt is None:
                        ok = False
                        break
                    cur = nxt
                if ok and cur - p - (nq - 1) <= slop:
                    freq += 1
        else:
            aa, bb = pos_lists
            for p in aa:
                if any(q != p and abs(q - p) - 1 <= slop for q in bb):
                    freq += 1
        if freq == 0:
            continue
        dl_eff = effective_doc_len_mirror(dls[key])
        s = sum_idf * freq * (k1 + 1.0) / (
            freq + k1 * (1.0 - b + b * dl_eff / avgdl)
        )
        scored.append((key, s))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored[:k]
