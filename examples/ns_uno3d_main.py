"""NS-3D spatiotemporal training driver — 1:1 replacement for the
reference's ``ns_uno3d_main.py`` (S=64, T_in=10 -> T_f=40 via Uno3D_T40
pad=3, 9000/1000/1000, width 8, 500 epochs, lr 3e-3).

    python examples/ns_uno3d_main.py --data ns_data.mat
    python examples/ns_uno3d_main.py --generate --ntrain 32 --epochs 2
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uno_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["train", "--preset", "ns3d_t40", *sys.argv[1:]]))
