from deepreadmapper_tpu.io.fasta import (  # noqa: F401
    extract_fasta_sequence,
    parse_fasta_records,
    reverse_complement,
    window_byte_matrix,
    windows_as_strings,
)
from deepreadmapper_tpu.io.fastq import parse_fastq  # noqa: F401
from deepreadmapper_tpu.io.readers import read_file  # noqa: F401
from deepreadmapper_tpu.io.configstore import load_config, save_config  # noqa: F401
from deepreadmapper_tpu.io.results import save_results  # noqa: F401
from deepreadmapper_tpu.io.sam import write_sam  # noqa: F401
