"""`python -m tpu_viterbi` == the reference CLI (same flags as
`./main -n -s -i -m -o -c -v`, src/main.cpp:183-193); also installed as
the `tpu-viterbi` console script (pyproject.toml)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
