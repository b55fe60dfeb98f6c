"""``python -m cmad_tpu`` == the ``cmad`` console script."""
from cmad_tpu.cli.main import console_main

if __name__ == "__main__":
    console_main()
