"""NS-2D autoregressive training driver — 1:1 replacement for the
reference's ``ns_uno2d_main.py`` (S=64, T_in=10, T_f=40 rollout,
4000/500/500, width 32, 500 epochs, UNO with factor 3/4).

    python examples/ns_uno2d_main.py --data ns_data.mat
    python examples/ns_uno2d_main.py --generate --ntrain 64 --epochs 4
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uno_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["train", "--preset", "ns2d", *sys.argv[1:]]))
