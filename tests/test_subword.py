"""BERT subword label propagation: the reference's golden vectors
(tests/test_bert_ner.py:892-968) against textfns.subword_token_labels."""

import numpy as np

from deep_ner_spark import textfns


def test_subword_labels_golden01():
    tokens = ['Ба', '##рак', 'Об', '##ама', 'принимает', 'в', 'Б', '##елом',
              'доме', 'своего', 'французского', 'кол', '##ле', '##гу', 'Н',
              '##ико', '##ля', 'Са', '##рко', '##зи', '.']
    bounds = [(0, 2), (2, 5), (6, 8), (8, 11), (12, 21), (22, 23), (24, 25),
              (25, 29), (30, 34), (35, 41), (42, 54), (55, 58), (58, 60),
              (60, 62), (63, 64), (64, 67), (67, 69), (70, 72), (72, 75),
              (75, 77), (77, 78)]
    paint = np.array(
        [1] * 11 + [0] * 13 + [2] * 10 + [0] * 29 + [3] * 14 + [0], dtype=np.int32
    )
    label_ids = {1: 1, 2: 2, 3: 1}
    got = textfns.subword_token_labels(tokens, bounds, paint, label_ids, 32)
    want = [0, 2, 1, 1, 1, 0, 0, 4, 3, 3, 0, 0, 0, 0, 0, 2, 1, 1, 1, 1, 1, 0,
            0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    assert got.tolist() == want


def test_subword_labels_golden03_backfill():
    # word-start 'В' is painted but '##есной' run needs the back-fill branch
    tokens = ['В', '##есной', '1890', 'года', 'В', '##ар', '##ша', '##вский',
              'и', 'Томск', '##ий', 'университет', '##ы', 'из', '##бира',
              '##ют', 'его', 'профессором', '.']
    bounds = [(0, 1), (1, 6), (7, 11), (12, 16), (17, 18), (18, 20), (20, 22),
              (22, 27), (28, 29), (30, 35), (35, 37), (38, 49), (49, 50),
              (51, 52), (53, 57), (57, 59), (60, 63), (64, 75), (75, 76)]
    paint = np.array(
        [1] * 16 + [0] + [2] * 12 + [0] + [3] * 20 + [0] * 26, dtype=np.int32
    )
    label_ids = {1: 1, 2: 2, 3: 2}
    got = textfns.subword_token_labels(tokens, bounds, paint, label_ids, 32)
    want = [0, 2, 1, 1, 1, 4, 3, 3, 3, 3, 4, 3, 3, 3, 0, 0, 0, 0, 0, 0, 0, 0,
            0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    assert got.tolist() == want


def test_subword_labels_golden02():
    tokens = ['С', '1876', 'г', 'Павло', '##в', 'а', '##сси', '##сти',
              '##рует', 'профессор', '##у', 'К', '.', 'Н', '.', 'У', '##сти',
              '##мов', '##ич', '##у', 'в', 'М', '##еди', '##ко', '-', 'х',
              '##ир', '##ург', '##ической', 'академии', 'и', 'пара', '##лл',
              '##ельно', 'из', '##уч', '##ает', 'ф', '##из', '##ио', '##логи',
              '##ю', 'к', '##рово', '##об', '##ращения', '.']
    bounds = [(0, 1), (2, 6), (7, 8), (9, 14), (14, 15), (16, 17), (17, 20),
              (20, 23), (23, 27), (28, 37), (37, 38), (39, 40), (40, 41),
              (42, 43), (43, 44), (45, 46), (46, 49), (49, 52), (52, 54),
              (54, 55), (56, 57), (58, 59), (59, 62), (62, 64), (64, 65),
              (65, 66), (66, 68), (68, 71), (71, 78), (79, 87), (88, 89),
              (90, 94), (94, 96), (96, 101), (102, 104), (104, 106),
              (106, 109), (110, 111), (111, 113), (113, 115), (115, 119),
              (119, 120), (121, 122), (122, 126), (126, 128), (128, 135),
              (135, 136)]
    paint = np.array(
        [0, 0] + [1] * 6 + [0] + [2] * 6 + [0] * 13 + [3] * 10 + [0] + [4] * 16
        + [0, 0, 0] + [5] * 29 + [0] * 49,
        dtype=np.int32,
    )
    label_ids = {1: 1, 2: 2, 3: 3, 4: 2, 5: 4}
    got = textfns.subword_token_labels(tokens, bounds, paint, label_ids, 64)
    want = [0, 0, 2, 1, 4, 3, 0, 0, 0, 0, 6, 5, 4, 3, 3, 3, 3, 3, 3, 3, 3, 0,
            8, 7, 7, 7, 7, 7, 7, 7, 7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
            0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    assert got.tolist() == want


def test_wordpiece_tokenize():
    vocab = frozenset(["un", "##aff", "##able", "hello", "##o", "hell"])
    assert textfns.wordpiece_tokenize("unaffable", vocab) == ["un", "##aff", "##able"]
    assert textfns.wordpiece_tokenize("hello", vocab) == ["hello"]
    assert textfns.wordpiece_tokenize("xyz", vocab) == ["[UNK]"]


def test_wordpiece_published_edge_cases():
    """Pin the published WordpieceTokenizer behaviors (the BERT repo's
    tokenization.py, loaded by the reference at bert_ner.py:731-771):
    max_chars_per_word overflow -> [UNK]; greedy longest-match has NO
    backtracking, so a mid-word miss collapses the WHOLE word to [UNK]
    even when a shorter first piece would have succeeded; empty input
    yields no pieces."""
    from deep_ner_spark import textfns

    vocab = frozenset(["ab", "a", "##bc", "##b", "x"])
    # greedy takes 'ab', then '##c' misses -> whole word [UNK], despite
    # 'a' + '##bc' being a valid segmentation
    assert textfns.wordpiece_tokenize("abc", vocab) == ["[UNK]"]
    # shorter word segments fine via the continuation piece
    assert textfns.wordpiece_tokenize("abb", vocab) == ["ab", "##b"]
    # max_chars boundary: exactly at the limit still tokenizes; above -> [UNK]
    assert textfns.wordpiece_tokenize("x" * 5, frozenset(["x", "##x"]), max_chars=5) == [
        "x", "##x", "##x", "##x", "##x",
    ]
    assert textfns.wordpiece_tokenize("x" * 6, frozenset(["x", "##x"]), max_chars=5) == ["[UNK]"]
    # empty token -> no pieces
    assert textfns.wordpiece_tokenize("", vocab) == []
    # continuation prefix is never matched at word start
    assert textfns.wordpiece_tokenize("bc", frozenset(["##bc"])) == ["[UNK]"]


# --- UDF-3 WordPiece: frozen-vocab fixture goldens ---------------------------

from pathlib import Path

_VOCAB_FIXTURE = Path(__file__).parent / "fixtures" / "wordpiece_vocab_1k.txt"


def _load_vocab():
    return frozenset(
        w for w in _VOCAB_FIXTURE.read_text().split("\n") if w
    )


def _published_wordpiece(token, vocab, max_chars=200):
    """Independent transcription of the published BERT WordpieceTokenizer
    loop (google-research/bert tokenization.py, Apache-2.0; the reference
    delegates to it at bert_ner.py:731-771): chars-list greedy
    longest-match-first with an is_bad whole-word bail-out.  Differential
    twin for textfns.wordpiece_tokenize, which is written stem-first on the
    string instead."""
    chars = list(token)
    if len(chars) > max_chars:
        return ["[UNK]"]
    is_bad, start, sub_tokens = False, 0, []
    while start < len(chars):
        end, cur = len(chars), None
        while start < end:
            substr = "".join(chars[start:end])
            if start > 0:
                substr = "##" + substr
            if substr in vocab:
                cur = substr
                break
            end -= 1
        if cur is None:
            is_bad = True
            break
        sub_tokens.append(cur)
        start = end
    return ["[UNK]"] if is_bad else sub_tokens


def test_wordpiece_fixture_goldens():
    """Frozen ~1k-entry vocab fixture + hard-coded golden piece sequences
    (derived once from the published algorithm, then frozen here) — UDF-3's
    fixture-golden check.  Covers whole-word hits, suffix continuations,
    char-level fallback chains, digits, and single chars."""
    vocab = _load_vocab()
    goldens = {
        "unaffable": ["unaffable"],
        "running": ["running"],
        "tokenizer": ["tokenizer"],
        "transformer": ["transformer"],
        "jumped": ["jumped"],
        "helpfulness": ["help", "##ful", "##ness"],
        "playfully": ["play", "##ful", "##ly"],
        "states": ["state", "##s"],
        "tokenization": ["token", "##i", "##z", "##ation"],
        "preprocess": ["pre", "##p", "##r", "##o", "##c", "##es", "##s"],
        "zzzq": ["z", "##z", "##z", "##q"],
        "unhappiness": ["un", "##h", "##a", "##p", "##p", "##i", "##ness"],
        "misunderstanding": ["mis", "##u", "##n", "##d", "##ers", "##t",
                             "##a", "##n", "##d", "##ing"],
        "7": ["7"],
        "42": ["4", "##2"],
        "a": ["a"],
        "qx": ["q", "##x"],
        "Σ": ["[UNK]"],  # off-alphabet char: no piece, whole word bails out
    }
    for word, expect in goldens.items():
        assert textfns.wordpiece_tokenize(word, vocab) == expect, word


def test_wordpiece_differential_vs_published_algorithm():
    """textfns.wordpiece_tokenize == the published-loop transcription on a
    seeded sweep of random words over the fixture alphabet (incl. lengths
    straddling max_chars), not just the hand-picked goldens."""
    import random

    vocab = _load_vocab()
    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789.'-Σ"
    words = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 30)))
             for _ in range(400)]
    words += ["x" * n for n in (199, 200, 201)]
    for w in words:
        assert textfns.wordpiece_tokenize(w, vocab) == _published_wordpiece(
            w, vocab
        ), w
