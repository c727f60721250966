"""Darcy flow training driver — 1:1 replacement for the reference's
``darcy_flow_main.py`` (same config: S=211 via sub=2, 1500/250/250 split,
width 32, 700 epochs, StepLR(100, 0.5), UNO_9 pad=12).

The reference shuffles two 800+200-sample files together
(darcy_flow_main.py:37-93); point ``--data`` at the same .mat file(s), or
pass ``--generate`` to synthesize data with the built-in JAX Darcy solver.

    python examples/darcy_flow_main.py --data piececonst_r421_N1024.mat
    python examples/darcy_flow_main.py --generate --ntrain 64 --epochs 5
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uno_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["train", "--preset", "darcy_s211", *sys.argv[1:]]))
