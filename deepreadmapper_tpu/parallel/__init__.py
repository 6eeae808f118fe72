from deepreadmapper_tpu.parallel.mesh import make_mesh  # noqa: F401
from deepreadmapper_tpu.parallel.sharded_search import sharded_l2_topk  # noqa: F401
