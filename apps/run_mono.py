#!/usr/bin/env python
"""Single-agent monocular SLAM runner (thin wrapper over run_slam.py).

Kept for compatibility with existing scripts: ``--inertial`` maps to
``--sensor mono_inertial``. See apps/run_slam.py for the full
multi-sensor runner (the reference's per-sensor client nodes,
ros/src/ClientNode.cc + MonoInertialNode.cc)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))


def main() -> None:
    argv = []
    sensor = "mono"
    for a in sys.argv[1:]:
        if a == "--inertial":
            sensor = "mono_inertial"
        else:
            argv.append(a)
    sys.argv = [sys.argv[0]] + argv + ["--sensor", sensor]
    import run_slam
    run_slam.main()


if __name__ == "__main__":
    main()
