from deepreadmapper_tpu.utils.trace import Tracer, stage  # noqa: F401
from deepreadmapper_tpu.utils.logging import log, set_verbose  # noqa: F401
