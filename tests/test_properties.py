"""Property-based tests (hypothesis) for the pure semantic contracts."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deep_ner_spark import textfns

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_normalize_is_length_preserving_and_idempotent(s):
    n = textfns.normalize_text(s)
    assert len(n) == len(s)
    assert textfns.normalize_text(n) == n
    # no dash variants or non-space whitespace survive
    assert not any(c in textfns.DASH_VARIANTS for c in n)
    assert not any(c.isspace() and c != " " for c in n)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_tokenize_bounds_are_consistent_slices(s):
    n = textfns.normalize_text(s)
    for tok, a, b in textfns.tokenize_with_bounds(n):
        assert n[a:b] == tok
        assert tok.strip() == tok and tok != ""
    # bounds are strictly increasing and non-overlapping
    bounds = [(a, b) for _, a, b in textfns.tokenize_with_bounds(n)]
    for (a1, b1), (a2, b2) in zip(bounds, bounds[1:]):
        assert b1 <= a2


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_shape_has_no_adjacent_repeats(tok):
    sh = textfns.shape_of_string(tok)
    assert all(a != b for a, b in zip(sh, sh[1:]))
    assert len(sh) <= len(tok)


@st.composite
def entities_case(draw):
    text_len = draw(st.integers(20, 120))
    n_tok = draw(st.integers(1, 12))
    cuts = sorted(draw(st.sets(st.integers(0, text_len - 1), min_size=n_tok, max_size=n_tok)))
    bounds = []
    for i, c in enumerate(cuts):
        end = cuts[i + 1] if i + 1 < len(cuts) else text_len
        if end > c:
            bounds.append((c, min(end, c + draw(st.integers(1, 8)))))
    classes = ("A", "B", "C")
    ents = {}
    for _ in range(draw(st.integers(0, 4))):
        t = draw(st.sampled_from(classes))
        a = draw(st.integers(0, text_len - 2))
        b = draw(st.integers(a + 1, text_len))
        ents.setdefault(t, []).append((a, b))
    return text_len, bounds, classes, ents


@given(entities_case())
@settings(max_examples=150, deadline=None)
def test_label_pipeline_invariants(case):
    """Char paint -> majority -> BIO -> decode: every decoded span lies
    within token coverage and uses known classes; codes obey the B-even /
    I-odd codec."""
    text_len, bounds, classes, ents = case
    paint, i2c = textfns.paint_entity_chars(text_len, classes, ents)
    labels = textfns.token_labels(bounds, paint, i2c, max(len(bounds), 1))
    for code in labels:
        assert code >= 0
        if code > 0:
            k = (code - 1) // 2
            assert 0 <= k < len(classes)
    if len(bounds):
        decoded = textfns.decode_bio_spans(bounds, classes, labels.tolist())
        lo = min(a for a, _ in bounds)
        hi = max(b for _, b in bounds)
        for t, spans in decoded.items():
            assert t in classes
            for a, b in spans:
                assert lo <= a < b <= hi


@given(st.lists(st.integers(0, 3), min_size=1, max_size=30))
@settings(max_examples=150, deadline=None)
def test_bio_encode_instances_codec(insts):
    inst = np.array(insts, dtype=np.int64)
    i2c = {1: 1, 2: 2, 3: 1}
    codes = textfns.bio_encode_instances(inst, i2c)
    prev = 0
    for x, code in zip(insts, codes):
        if x == 0:
            assert code == 0
        else:
            k = i2c[x]
            assert code == (2 * k - 1 if x == prev else 2 * k)
        prev = x


@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(1, 20)), min_size=0, max_size=8
    ),
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(1, 20)), min_size=0, max_size=8
    ),
)
@settings(max_examples=150, deadline=None)
def test_match_spans_bounds(gold_raw, pred_raw):
    """tp+fn == total gold chars and tp+fp == total pred chars — the
    conservation law of the char-overlap metric."""
    from deep_ner_spark.operators.quality import match_spans

    gold = [(a, a + l) for a, l in gold_raw]
    pred = [(a, a + l) for a, l in pred_raw]
    tp, fp, fn = match_spans(gold, pred)
    assert tp + fn == sum(b - a for a, b in gold)
    assert tp + fp == sum(b - a for a, b in pred)
    assert tp >= 0 and fp >= 0 and fn >= 0


# --- stdlib PNG/WAV codec round-trips (multimodal real-decode path) ---------

_img_strategy = st.tuples(
    st.integers(min_value=1, max_value=12),   # height
    st.integers(min_value=1, max_value=12),   # width
    st.sampled_from([1, 3, 4]),               # channels: gray/RGB/RGBA
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=6),
)


@given(_img_strategy)
@settings(max_examples=40, deadline=None)
def test_png_decode_roundtrip_property(params):
    """decode(encode(img, any per-row filter mix)) == img for every shape,
    channel count and scanline-filter combination."""
    import numpy as np

    from deep_ner_spark.operators.multimodal import _decode_image
    from tests.test_multimodal import _png_encode

    h, w, nch, seed, filters = params
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, nch), dtype=np.uint8)
    got = _decode_image(_png_encode(img, row_filters=filters), w, h)
    want = img if nch == 3 else (
        np.repeat(img, 3, axis=2) if nch == 1 else img[:, :, :3]
    )
    assert got.shape == (h, w, 3)
    assert np.array_equal(got, want)


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767),
             min_size=1, max_size=200),
    st.sampled_from([1, 2]),
)
@settings(max_examples=40, deadline=None)
def test_wav_decode_roundtrip_property(samples, nch):
    import numpy as np

    from deep_ner_spark.operators.multimodal import _decode_audio
    from tests.test_multimodal import _wav_encode

    i16 = np.asarray(samples, dtype=np.int16)
    if nch == 2:  # interleave a junk second channel; decode keeps the first
        blob = _wav_encode(
            np.stack([i16, np.roll(i16, 1)], axis=1).reshape(-1), nch=2
        )
    else:
        blob = _wav_encode(i16)
    got = _decode_audio(blob, n_samples=0)
    assert np.array_equal(got, i16.astype(np.float32) / 32768.0)


_jpeg_strategy = st.tuples(
    st.integers(min_value=1, max_value=20),   # height
    st.integers(min_value=1, max_value=20),   # width
    st.sampled_from(["gray", "rgb", "rgb420"]),
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.sampled_from([0, 0, 1, 3]),            # restart interval (0 = none)
)


@given(_jpeg_strategy)
@settings(max_examples=40, deadline=None)
def test_jpeg_decode_roundtrip_property(params):
    """Baseline-JPEG round-trip with unit quant tables stays within DCT
    rounding error for every shape / colorspace / sampling / restart mix
    (4:2:0 uses 2x2-block-constant pixels so chroma subsampling is
    lossless and the same bound applies)."""
    import numpy as np

    from deep_ner_spark.operators.multimodal import _decode_image
    from tests.test_multimodal import _jpeg_encode

    h, w, mode, seed, rst = params
    rng = np.random.default_rng(seed)
    if mode == "gray":
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        blob = _jpeg_encode(img, restart_interval=rst)
        want = np.repeat(img[:, :, None], 3, axis=2)
    elif mode == "rgb":
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = _jpeg_encode(img, restart_interval=rst)
        want = img
    else:  # rgb420: 2x2-constant pixels survive mean-down + nearest-up
        small = rng.integers(0, 256, size=(-(-h // 2), -(-w // 2), 3),
                             dtype=np.uint8)
        img = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)[:h, :w]
        blob = _jpeg_encode(img, subsample=True, restart_interval=rst)
        want = img
    got = _decode_image(blob, w, h)
    assert got.shape == (h, w, 3)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 4
