"""Driver-contract shim: prints one JSON benchmark line.

The implementation lives in mri_nanoparticle_simulation_tpu/benchmark.py
(also installed as the ``mri-t2-bench`` console script).
"""

import sys

from mri_nanoparticle_simulation_tpu.benchmark import main

if __name__ == "__main__":
    sys.exit(main())
