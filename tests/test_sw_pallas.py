"""Pallas SW kernel parity (interpreter mode on CPU)."""

import numpy as np

from deepreadmapper_tpu.ops import sw
from deepreadmapper_tpu.ops.sw_pallas import sw_scores_pallas
from deepreadmapper_tpu.tokenizer import strings_to_bytes


def test_pallas_kernel_matches_scan_interpret():
    rng = np.random.default_rng(5)
    alphabet = np.array(list("ACGT"))
    a = ["".join(rng.choice(alphabet, n)) for n in [150, 150, 30, 150]]
    b = ["".join(rng.choice(alphabet, n)) for n in [152, 40, 152, 152]]
    am, al = strings_to_bytes(a)
    bm, bl = strings_to_bytes(b)
    got = sw_scores_pallas(am, al, bm, bl, interpret=True)
    want = sw.sw_scores(am, al, bm, bl)
    np.testing.assert_array_equal(got, want)


def test_pallas_kernel_wrapped_query_interpret():
    cand = "ACGTACGTACGTACGTACGT"
    query = "<" + cand + ">"
    am, al = strings_to_bytes([cand])
    bm, bl = strings_to_bytes([query])
    got = sw_scores_pallas(am, al, bm, bl, interpret=True)
    assert got[0] == sw.sw_score_reference(cand, query)
