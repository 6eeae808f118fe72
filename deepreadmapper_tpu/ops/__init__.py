from deepreadmapper_tpu.ops.topk import l2_topk  # noqa: F401
