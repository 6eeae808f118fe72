"""`python -m deepreadmapper_tpu` == `python -m deepreadmapper_tpu.cli`."""

if __name__ == "__main__":
    import sys

    from deepreadmapper_tpu.cli import main

    sys.exit(main())
