"""Cross-camera descriptor matchability: extract features from the KB8
agent's frame and the pinhole agent's frame of the SAME world region and
count mutual descriptor matches — isolates imaging/detection differences
from the collab machinery."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import jax.numpy as jnp
from multi_orbslam3_tpu.dataio import synthetic
from multi_orbslam3_tpu.frontend import extractor, matcher
from test_collab_hetero import kb8_config, pinhole_config


def main():
    c_kb8 = kb8_config()
    c_pin = pinhole_config()
    F = 16
    seq0 = synthetic.make_sequence(c_kb8, n_frames=F, n_points=600, seed=11,
                                   trajectory="forward", phase=0.0)
    seq1 = synthetic.make_sequence(c_pin, n_frames=F, n_points=600, seed=11,
                                   trajectory="forward", phase=0.35)
    # agent1 at phase 0.35 ~= agent0 7 frames later for a 20-frame period?
    # compare a few offsets
    for i0, i1 in ((10, 0), (12, 2), (8, 0), (10, 2)):
        f0 = extractor.extract_features(
            jnp.asarray(seq0.images[i0], jnp.float32), c_kb8)
        f1 = extractor.extract_features(
            jnp.asarray(seq1.images[i1], jnp.float32), c_pin)
        res = matcher.match_mutual(f0.desc, f0.valid, f1.desc, f1.valid,
                                   max_dist=matcher.TH_LOW, ratio=0.9,
                                   angle1=f0.angle, angle2=f1.angle)
        n = int(res.count)
        # same-camera baseline: agent0 frame vs agent0 later frame
        res_same = matcher.match_mutual(
            f0.desc, f0.valid,
            extractor.extract_features(
                jnp.asarray(seq0.images[i0 + 2], jnp.float32), c_kb8).desc,
            f0.valid, max_dist=matcher.TH_LOW, ratio=0.9)
        print(f"kb8[{i0}] vs pin[{i1}]: cross={n:4d}  "
              f"same-cam baseline={int(res_same.count):4d}  "
              f"(valid {int(jnp.sum(f0.valid))}/{int(jnp.sum(f1.valid))})")
    # level histograms
    f0 = extractor.extract_features(
        jnp.asarray(seq0.images[10], jnp.float32), c_kb8)
    f1 = extractor.extract_features(
        jnp.asarray(seq1.images[0], jnp.float32), c_pin)
    for nm, f in (("kb8", f0), ("pin", f1)):
        lv = np.asarray(f.level)[np.asarray(f.valid)]
        print(nm, "levels:", np.bincount(lv, minlength=4))


if __name__ == "__main__":
    main()
