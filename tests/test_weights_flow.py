"""Fine-tuned encoder weights flow through the CLI surface.

The index and the queries MUST be embedded by the same encoder (fine-tuning
moves the whole embedding space — DEPLOYMENT.md's 0.81 -> 0.995 lever), so
build-index --weights persists the npz into the index dir and pipeline
auto-loads it.  A mismatch is the kind of silent accuracy kill the reference
cannot even express (its model path is a fixed OpenVINO IR)."""

import os

import jax
import numpy as np
import pytest

from deepreadmapper_tpu.models.encoder import Vectorizer, load_params
from deepreadmapper_tpu.pipeline.build import build_index
from deepreadmapper_tpu.pipeline.finetune import save_params_npz
from deepreadmapper_tpu.pipeline.search import run_pipeline


@pytest.fixture(scope="module")
def tuned_npz(tmp_path_factory):
    # stand-in for a finetune run: visibly different weights, same format
    params = load_params()
    params = jax.tree_util.tree_map(lambda x: x * 1.05, params)
    path = str(tmp_path_factory.mktemp("w") / "tuned.npz")
    save_params_npz(params, path)
    return path


def test_index_records_and_pipeline_autoloads_weights(
    data_dir, tmp_path, tuned_npz
):
    fna = str(data_dir / "ecoli_150.fna")
    fq = str(data_dir / "test_data.fastq")
    prefix = str(tmp_path / "idx")
    config = build_index(
        fna, prefix, 150, index_type="INT8FLAT", weights=tuned_npz
    )
    assert config["weights"] == "encoder.npz"
    assert os.path.exists(os.path.join(prefix, "encoder.npz"))

    out_auto = str(tmp_path / "auto")
    run_pipeline(prefix, fq, fna, k=8, output_dir=out_auto, write_sam=False)
    out_expl = str(tmp_path / "expl")
    run_pipeline(
        prefix, fq, fna, k=8, output_dir=out_expl, write_sam=False,
        vectorizer=Vectorizer(load_params(tuned_npz)),
    )
    d_auto = np.load(os.path.join(out_auto, "distances.npy"))
    d_expl = np.load(os.path.join(out_expl, "distances.npy"))
    np.testing.assert_array_equal(d_auto, d_expl)

    # the default encoder would land somewhere else entirely
    out_def = str(tmp_path / "default")
    run_pipeline(
        prefix, fq, fna, k=8, output_dir=out_def, write_sam=False,
        vectorizer=Vectorizer(),
    )
    d_def = np.load(os.path.join(out_def, "distances.npy"))
    assert not np.array_equal(d_auto, d_def)


def test_weights_with_mismatched_vectorizer_raises(
    data_dir, tmp_path, tuned_npz
):
    # weights= + vectorizer= is allowed ONLY when they agree (harnesses
    # pre-load the tuned encoder once to avoid per-build re-jits); a
    # mismatched pair would embed windows with one encoder while recording
    # another for query time — the exact footgun weights= exists to prevent
    with pytest.raises(ValueError, match="do not match"):
        build_index(
            str(data_dir / "ecoli_150.fna"), str(tmp_path / "x"), 150,
            weights=tuned_npz, vectorizer=Vectorizer(),
        )
    # the matching pair builds fine and still records encoder.npz
    from deepreadmapper_tpu.models.encoder import load_params as _lp

    cfg = build_index(
        str(data_dir / "ecoli_150.fna"), str(tmp_path / "ok"), 150,
        weights=tuned_npz, vectorizer=Vectorizer(_lp(tuned_npz)),
    )
    assert cfg["weights"] == "encoder.npz"
    assert os.path.exists(str(tmp_path / "ok" / "encoder.npz"))
