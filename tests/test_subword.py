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
