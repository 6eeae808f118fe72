"""Tokenizer parity tests.

The vectorized tokenizer must match the scalar transliteration of the
reference (src/inference/preprocess.cpp:20-42) token for token, including the
result[0] wrapped-input quirk and the truncation rules.
"""

import numpy as np
import pytest

from deepreadmapper_tpu import tokenizer as tok


def test_hash_table_layout():
    # Spot-check ids against models/tok2index.txt values.
    assert tok.HASH_TO_ID[0] == 7542  # <aa
    assert tok.HASH_TO_ID[15] == 7557  # <tt
    assert tok.HASH_TO_ID[16] == 7558  # aa>
    assert tok.HASH_TO_ID[31] == 7633  # tt>
    assert tok.HASH_TO_ID[32] == 7559  # aaa
    assert tok.HASH_TO_ID[95] == 7637  # ttt
    assert tok.HASH_TO_ID[96:].sum() == 0


def test_wrapped_first_token_quirk():
    # For wrapped input the first token is id[28 + val(first_base)]:
    # ta>/tc>/tg>/tt> = 7618/7623/7628/7633.
    for base, expected in zip("ACGT", (7618, 7623, 7628, 7633)):
        seq = "<" + base + "A" * 150 + ">"
        ids = tok.tokenize_strings([seq])[0]
        assert ids[0] == expected


def test_matches_reference_scalar_on_random_seqs():
    rng = np.random.default_rng(0)
    alphabet = np.array(list("ACGTN"))
    seqs = []
    for n in [2, 3, 5, 50, 121, 122, 123, 124, 150, 152, 200]:
        s = "".join(rng.choice(alphabet, size=n))
        seqs.append("<" + s + ">")  # wrapped
        seqs.append(s)  # unwrapped (lookup-mode candidates)
    got = tok.tokenize_strings(seqs)
    for i, s in enumerate(seqs):
        want = tok.tokenize_reference(s)
        np.testing.assert_array_equal(
            got[i, : len(want)], np.array(want), err_msg=f"seq {i}: {s[:30]}..."
        )
        assert got[i, len(want) :].sum() == 0


def test_truncation_length():
    s = "<" + "A" * 150 + ">"
    ids = tok.tokenize_strings([s])
    assert (ids[0] != 0).sum() == 123  # truncated to MAX_LEN tokens


def test_short_sequence_end_token():
    # 10-base wrapped window: last token sees '>' twice (reference UB-free path).
    s = "<ACGTACGTAC>"
    ids = tok.tokenize_strings([s])[0]
    want = tok.tokenize_reference(s)
    np.testing.assert_array_equal(ids[: len(want)], want)
    assert len(want) == 12


def test_golden_first_read_tokens(data_dir):
    """Golden token ids for the first fixture read, derived once from the
    scalar oracle and pinned so regressions in EITHER path are caught."""
    with open(data_dir / "test_data.fastq") as f:
        f.readline()
        seq = "<" + f.readline().strip() + ">"
    ids = tok.tokenize_strings([seq])[0]
    ref = tok.tokenize_reference(seq)
    np.testing.assert_array_equal(ids[:123], ref)
    # First token quirk: read starts with 'G' -> tg> = 7628.
    assert ids[0] == 7628
    # Token 1 is the true start token '<' + first two bases "GT" -> <gt.
    assert ids[1] == 7553
