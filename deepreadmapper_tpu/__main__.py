"""`python -m deepreadmapper_tpu` == `python -m deepreadmapper_tpu.cli`."""

import sys

from deepreadmapper_tpu.cli import main

sys.exit(main())
