"""Property-based tests (hypothesis) for the pure-Python core.

The reference tests with fixed fixtures only (SURVEY §5); properties
here pin the invariants those fixtures sample: grid enumeration is a
bijection, batch assignment partitions the grid evenly, moment
accumulation is order-independent, and parsing normalization is
idempotent.  Kept Spark-free so they run in milliseconds.
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xyzpy_spark.functions.stats import (
    RunningStatistics,
    format_number_with_error,
)
from xyzpy_spark.grid import grid_size, _strides
from xyzpy_spark.prepare import parse_cases, parse_combos
from xyzpy_spark.utils import flatten, prod, unzip

combos_strategy = st.dictionaries(
    st.text("abcdefg", min_size=1, max_size=3),
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=6, unique=True),
    min_size=1,
    max_size=4,
)


@given(combos_strategy)
def test_grid_size_is_product(combos):
    assert grid_size(combos) == prod(len(v) for v in combos.values())


@given(combos_strategy)
def test_stride_enumeration_is_bijective(combos):
    """loc -> (value indices) decoding covers every point exactly once
    (the distributed grid builder's arithmetic, driver-checked)."""
    parsed = parse_combos(combos)
    strides = _strides(parsed)
    n = grid_size(combos)
    seen = set()
    for loc in range(n):
        point = tuple(
            (loc // stride) % len(vals)
            for (_, vals), stride in zip(parsed, strides)
        )
        seen.add(point)
    assert len(seen) == n


@given(st.integers(1, 500), st.integers(1, 60))
def test_batch_assignment_partitions_evenly(n, nb):
    """batch = loc*nb//n: contiguous, total n, sizes differ by <= 1
    (the crop batching rule)."""
    nb = min(nb, n)
    batches = [loc * nb // n for loc in range(n)]
    assert batches == sorted(batches)
    sizes = [batches.count(b) for b in range(nb)]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1


@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, width=32),
        min_size=2,
        max_size=200,
    ),
    st.integers(1, 7),
)
def test_running_statistics_chunking_invariant(xs, k):
    """Merging per-chunk moments == single-pass moments, any split."""
    whole = RunningStatistics()
    whole.update(xs)
    chunked = RunningStatistics()
    for chunk in np.array_split(np.array(xs, dtype=float), k):
        chunked.update(chunk)
    assert chunked.count == whole.count
    assert math.isclose(chunked.mean, whole.mean, rel_tol=1e-9, abs_tol=1e-6)
    if whole.count > 1 and not math.isnan(whole.var):
        assert math.isclose(
            chunked.var, whole.var, rel_tol=1e-6, abs_tol=1e-6
        )


@given(st.floats(-1e6, 1e6, allow_nan=False), st.floats(1e-9, 1e5))
@settings(max_examples=200)
def test_format_number_with_error_roundtrip(x, err):
    """Formatted value parses back within one error bar of x."""
    s = format_number_with_error(x, err)
    assert "(" in s and s.endswith(")")
    val = float(s[: s.index("(")])
    assert abs(val - x) <= err * 1.01 + 1e-12


@given(combos_strategy)
def test_parse_combos_idempotent(combos):
    once = parse_combos(combos)
    assert parse_combos(dict(once)) == once


@given(
    st.lists(
        st.tuples(st.integers(), st.text(max_size=3)),
        min_size=1,
        max_size=20,
    )
)
def test_unzip_roundtrip(pairs):
    a, b = unzip(pairs)
    assert list(zip(a, b)) == pairs


@given(st.lists(st.lists(st.integers(), max_size=5), max_size=5))
def test_flatten_one_level(nested):
    assert list(flatten(nested, 1)) == [x for sub in nested for x in sub]


# ---------------------------------------------------------------------------
# round-3 op invariants (python twins of the Spark expressions)
# ---------------------------------------------------------------------------

import hashlib
import re as _re
import unicodedata as _ud


def _bloom_positions_py(value: str, m: int, k: int):
    return [
        int(hashlib.md5(f"{value}:{i}".encode()).hexdigest()[:15], 16) % m
        for i in range(k)
    ]


@given(
    st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=40),
    st.sampled_from([1 << 8, 1 << 10, 1 << 12]),
)
@settings(max_examples=50, deadline=None)
def test_bloom_word_packing_roundtrip(values, m):
    """The int64-word packing and the byte-slice extraction used by
    bloom_contains agree bit-for-bit: for every position p, bit p&7 of
    byte p>>3 equals bit p&63 of word p>>6."""
    k = 3
    bits = set()
    for v in values:
        bits.update(_bloom_positions_py(v, m, k))
    words = [0] * (m // 64)
    for p in bits:
        words[p >> 6] |= 1 << (p & 63)
    buf = bytearray()
    for w in words:
        buf += (w & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    for p in range(m):
        via_words = (words[p >> 6] >> (p & 63)) & 1
        via_bytes = (buf[p >> 3] >> (p & 7)) & 1
        assert via_words == via_bytes == (1 if p in bits else 0)
    # no false negatives by construction
    for v in values:
        assert all(p in bits for p in _bloom_positions_py(v, m, k))


@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=2, max_size=8),
        min_size=1,
        max_size=10,
    ),
    st.lists(st.sampled_from("abcde"), min_size=2, max_size=8),
)
@settings(max_examples=50, deadline=None)
def test_bigram_lm_probabilities_are_proper(ref_docs, doc):
    """Add-k bigram probabilities stay in (0, 1] for any corpus, so
    per-bigram NLL terms are >= 0 — the LM score can never reward a
    document below 'perfectly predicted'."""
    k = 0.5
    uni, bi = {}, {}
    for toks in ref_docs:
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    for pair in zip(doc, doc[1:]):
        p = (bi.get(pair, 0) + k) / (uni.get(pair[0], 0) + k * v)
        assert 0 < p <= 1
        assert -math.log(p) >= 0


@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=32,
    )
)
@settings(max_examples=100, deadline=None)
def test_quantization_error_bound(vec):
    """floor-quantization error is < one quantization step per
    component: |x - q*s/127| < s/127."""
    s = max(abs(x) for x in vec)
    if s == 0:
        return
    for x in vec:
        q = math.floor(x / s * 127)
        assert -128 <= q <= 127
        assert abs(x - q * s / 127.0) < s / 127.0 + 1e-12


def _normalize_py(t, form="NFC"):
    t = _ud.normalize(form, t)
    t = "".join(
        c for c in _ud.normalize("NFD", t) if not _ud.combining(c)
    )
    if form in ("NFC", "NFKC"):
        t = _ud.normalize("NFC", t)
    t = t.lower()
    return _re.sub(r"[ \t\n\f\r]+", " ", t).strip(" ")


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_normalize_text_idempotent(t):
    """The full canonicalization stack is idempotent — re-normalizing
    produces the identical string (the property exact-dedup relies
    on)."""
    once = _normalize_py(t)
    assert _normalize_py(once) == once


def _chunk_model(tokens, m, ov):
    """Driver-side twin of pipeline.text.chunk_documents' arithmetic."""
    n = len(tokens)
    if n == 0:
        return []
    stride = m - ov
    nc = 1 if n <= m else 1 + -(-(n - m) // stride)
    out = []
    for i in range(nc):
        s = min(i * stride, max(n - m, 0))
        out.append((s, tokens[s : s + m]))
    return out


@given(
    st.lists(st.text("ab", min_size=1, max_size=2), max_size=60),
    st.integers(2, 16),
    st.integers(0, 15),
)
@settings(max_examples=200, deadline=None)
def test_chunk_windows_cover_and_bound(tokens, m, ov):
    """Chunking invariants for any (corpus, budget, overlap): windows
    are uniform length min(m, n), their union covers every token
    exactly (no gaps, no token invented), and consecutive starts
    differ by at most the stride."""
    if ov >= m:
        return
    chunks = _chunk_model(tokens, m, ov)
    n = len(tokens)
    if n == 0:
        assert chunks == []
        return
    assert all(len(c) == min(m, n) for _, c in chunks)
    covered = set()
    for s, c in chunks:
        assert tokens[s : s + m] == c  # faithful slices
        covered.update(range(s, s + len(c)))
    assert covered == set(range(n))  # full coverage, no gaps
    starts = [s for s, _ in chunks]
    assert starts == sorted(starts)
    assert all(b - a <= m - ov for a, b in zip(starts, starts[1:]))


@given(st.integers(0, 10_000_000), st.integers(1, 4096))
@settings(max_examples=200, deadline=None)
def test_packing_stats_identities(total, m):
    """ceil identities the packing census relies on: concat sequences
    never exceed padded sequences, and padded-mode waste is always in
    [0, 1)."""
    ceil = (total + m - 1) // m
    assert 0 <= ceil * m - total < m
    if ceil:
        waste = 1.0 - total / (ceil * m)
        assert 0.0 <= waste < 1.0


@given(st.integers(-2047, 2047))
@settings(max_examples=300, deadline=None)
def test_jpeg_value_extension_roundtrip(v):
    """JPEG DC/AC value coding: encode (size, magnitude bits) then
    _extend-decode recovers every representable value exactly."""
    from xyzpy_spark.pipeline.jpeg import _extend

    s = 0
    a = abs(v)
    while a:
        s += 1
        a >>= 1
    enc = v if v >= 0 else v + (1 << s) - 1
    assert _extend(enc & ((1 << s) - 1) if s else 0, s) == v


@given(st.integers(0, 10_000), st.integers(1, 170))
@settings(max_examples=100, deadline=None)
def test_jpeg_canonical_codes_prefix_free(seed, n_syms):
    """Any Kraft-satisfying length profile yields a prefix-free
    canonical code table (no code is a prefix of another) — the
    property both the decoder and the custom encoder tables rely on.
    Profiles are built constructively (greedy Kraft budget spend from
    a seeded stream) so every generated profile is valid."""
    import random

    from xyzpy_spark.pipeline.jpeg import (
        _ENC_AC_BITS,
        _ENC_AC_VALS,
        _ENC_DC_BITS,
        _ENC_DC_VALS,
        _canonical_codes,
    )

    rng = random.Random(seed)
    bits = [0] * 16
    budget = 1 << 16  # Kraft budget in units of 2^-16
    for _ in range(n_syms):
        # pick any length whose codeword still fits the budget
        fits = [L for L in range(1, 17) if (1 << (16 - L)) <= budget]
        if not fits:
            break
        L = rng.choice(fits)
        bits[L - 1] += 1
        budget -= 1 << (16 - L)
    profiles = [
        (bits, bytes(range(sum(bits)))),
        (_ENC_DC_BITS, _ENC_DC_VALS),
        (_ENC_AC_BITS, _ENC_AC_VALS),
    ]
    for bb, vals in profiles:
        table = _canonical_codes(bb, vals)
        assert len(table) == sum(bb)
        codes = sorted(
            format(code, f"0{length}b") for (length, code) in table
        )
        for a, b in zip(codes, codes[1:]):
            assert not b.startswith(a), (a, b)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 24))
def test_jpeg_lut_decode_equals_bit_walk(seed, n_syms):
    """The 16-bit peek-LUT Huffman decoder must agree with the
    canonical bit-walk on every stream, including the zero-padded
    tail past the last marker — the r5 decode fast path's contract."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import (
        _BitReader,
        _canonical_codes,
        _decode_lut,
        _huff_decode,
        _huff_decode_lut,
    )

    rng = np.random.default_rng(seed)
    # random Kraft-satisfying length profile (same generator spirit
    # as the prefix-freedom test): assign lengths greedily
    lengths = sorted(
        int(rng.integers(2, 13)) for _ in range(n_syms)
    )
    # fix Kraft violations by lengthening codes until it fits
    while sum(2.0 ** -l for l in lengths) > 1.0:
        i = int(rng.integers(0, len(lengths)))
        if lengths[i] < 16:
            lengths[i] += 1
    bits = [0] * 16
    for l in lengths:
        bits[l - 1] += 1
    values = bytes(range(len(lengths)))
    table = _canonical_codes(bits, values)
    lut = _decode_lut(table)

    # SHORT payloads on purpose: 10 bytes = 80 bits vs up to 12
    # decodes x 16 bits, so most runs decode PAST the stream end and
    # exercise the zero-padded-tail branches of peek16/skip (the
    # claimed contract; a 40-byte payload never reached them)
    payload = bytes(
        int(b) for b in rng.integers(0, 255, size=10)
    )  # no 0xFF: plain entropy bytes
    a, b_ = _BitReader(payload, 0), _BitReader(payload, 0)
    for _ in range(12):
        try:
            want = _huff_decode(a, table)
        except ValueError:
            try:
                _huff_decode_lut(b_, lut)
            except ValueError:
                return  # both reject the same stream position
            raise AssertionError("LUT accepted what bit-walk rejected")
        got = _huff_decode_lut(b_, lut)
        assert got == want
        # logical stream position (bits consumed) must agree; the two
        # readers may have FILLED ahead differently (peek16 buffers up
        # to 16 bits), which is invisible to decoding
        assert a.p * 8 - a.n == b_.p * 8 - b_.n


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 4))
def test_jpeg_segreader_equals_bitreader(seed, n_segs):
    """The r6 vectorized-prep entropy reader (_entropy_segments +
    _SegReader) must be bit-for-bit equivalent to the byte-walking
    _BitReader across stuffed FFs, RST segment boundaries, and the
    zero-padded tail — the contract the inlined decode loop relies
    on."""
    from xyzpy_spark.pipeline.jpeg import (
        _BitReader,
        _SegReader,
        _entropy_segments,
    )

    rng = np.random.default_rng(seed)
    raw_segs = []
    stream = bytearray()
    for s in range(n_segs):
        n = int(rng.integers(0, 12))
        # bias toward 0xFF so stuffing paths are actually exercised
        seg = bytes(
            0xFF if rng.random() < 0.2 else int(b)
            for b in rng.integers(0, 255, size=n)
        )
        raw_segs.append(seg)
        stream += seg.replace(b"\xff", b"\xff\x00")
        if s < n_segs - 1:
            stream += bytes([0xFF, 0xD0 + (s % 8)])
    stream += b"\xff\xd9"

    segs = _entropy_segments(bytes(stream), 0)
    assert segs == raw_segs  # unstuffing + RST split are exact

    br = _BitReader(bytes(stream), 0)
    for idx, seg in enumerate(segs):
        if idx:
            br.align_past_rst()
        sr = _SegReader(seg)
        # more ops than the segment holds, so every run crosses into
        # the zero-padded tail
        for _ in range(16):
            assert sr.peek16() == br.peek16()
            k = int(rng.integers(1, 17))
            assert sr.read_bits(k) == br.read_bits(k)


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 2**32 - 1), st.booleans())
def test_jpeg_super_lut_equals_two_step(seed, is_ac):
    """The r7 fused super-LUT (one 16-bit window -> whole symbol:
    code length, run/size, EXTENDED value) must agree with the
    two-step code-then-magnitude read for every window of a random
    JPEG-shaped table — the contract the decode hot loop rides.
    Windows whose code+magnitude exceed 16 bits must be flagged -2
    (fallback), never mis-fused; invalid windows must stay -1.  Sizes
    12-15 (byte-valid but hostile — no baseline encoder emits them)
    must ALSO be -2: their extended value underflows the value+2048
    packing bias, so fusing them would emit a negative non-sentinel
    (r7 ADVICE — the sentinel space stays explicit)."""
    from xyzpy_spark.pipeline.jpeg import (
        _canonical_codes,
        _decode_lut_np,
        _super_lut,
    )

    rng = np.random.default_rng(seed)
    if is_ac:
        # JPEG-shaped AC symbols (run << 4) | size, PLUS hostile
        # size-12..15 entries that must route to the -2 sentinel
        syms = [0x00, 0xF0] + [
            (int(r) << 4) | int(s)
            for r, s in zip(
                rng.integers(0, 16, size=24),
                rng.integers(1, 16, size=24),
            )
        ]
    else:
        syms = list(range(16))  # DC sizes 0..15 (12+ hostile)
    syms = list(dict.fromkeys(syms))
    lengths = sorted(int(rng.integers(2, 13)) for _ in syms)
    while sum(2.0 ** -l for l in lengths) > 1.0:
        i = int(rng.integers(0, len(lengths)))
        if lengths[i] < 16:
            lengths[i] += 1
    bits = [0] * 16
    for l in lengths:
        bits[l - 1] += 1
    table = _canonical_codes(bits, bytes(syms))
    lut_np = _decode_lut_np(table)
    lut = lut_np.tolist()
    sup = _super_lut(lut_np, is_ac)

    for w in rng.integers(0, 1 << 16, size=400):
        w = int(w)
        entry, e = lut[w], sup[w]
        if entry == 0:
            assert e == -1
            continue
        clen, sym = entry >> 8, entry & 0xFF
        size = (sym & 0xF) if is_ac else sym
        if clen + size > 16 or size > 11:
            assert e == -2
            continue
        assert e > 0
        # two-step: magnitude = bits [clen, clen+size) of the window
        if size:
            mag = (w >> (16 - clen - size)) & ((1 << size) - 1)
            want_val = (
                mag if mag >= (1 << (size - 1)) else mag - (1 << size) + 1
            )
        else:
            want_val = 0
        assert (e >> 16) - 2048 == want_val, (w, sym)
        assert ((e >> 11) & 31) == clen + size
        assert ((e >> 6) & 31) == size
        d = e & 31
        if is_ac:
            run = sym >> 4
            want_d = 0 if sym == 0 else (16 if sym == 0xF0 else run + 1)
        else:
            want_d = 1
        assert d == want_d


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.sampled_from([1, 3, 7, 12]),
    st.integers(8, 40),
    st.integers(8, 40),
    st.booleans(),
)
def test_progressive_jpeg_equals_baseline_decode(seed, q, h, w, color):
    """Property pin of the r9 progressive codec: for ANY image the
    progressive scan script (DC first/refine at Al 1->0, two AC
    spectral bands with EOBRUN, AC successive-approximation
    refinement) decodes BIT-IDENTICAL to the baseline encoding of the
    same array at the same quant — successive approximation is
    lossless by construction, and this sweeps the EOBRUN/ZRL/
    correction-bit interactions fixed seeds can miss."""
    import numpy as np

    from xyzpy_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    # mixed content: noise half, flat half (flat -> long EOB runs)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    img[h // 2 :] = img[h // 2, 0]
    base = decode_jpeg(encode_jpeg(img, quant=q, restart_interval=None))
    prog = decode_jpeg(encode_jpeg_progressive(img, quant=q))
    assert prog is not None and base is not None
    assert prog[0] == base[0]
    assert np.array_equal(prog[1], base[1]), (seed, q, shape)
