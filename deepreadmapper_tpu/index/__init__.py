from deepreadmapper_tpu.index.registry import load_index, register_index  # noqa: F401
from deepreadmapper_tpu.index.flat import FlatIndex  # noqa: F401
from deepreadmapper_tpu.index.pq_flat import PQFlatIndex  # noqa: F401
from deepreadmapper_tpu.index.hnsw import HNSWFlatIndex, HNSWPQIndex  # noqa: F401
from deepreadmapper_tpu.index.int8_flat import Int8FlatIndex  # noqa: F401
from deepreadmapper_tpu.index.ivf_int8 import IVFInt8Index  # noqa: F401
from deepreadmapper_tpu.index.ivf_pq import IVFPQIndex  # noqa: F401
