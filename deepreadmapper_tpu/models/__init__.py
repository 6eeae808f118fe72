from deepreadmapper_tpu.models.encoder import (  # noqa: F401
    EncoderParams,
    encode_tokens,
    load_params,
)
