import jax.numpy as jnp
import numpy as np

from multi_orbslam3_tpu.frontend.extractor import FrameFeatures
from multi_orbslam3_tpu.map import mapstate as ms


def _feats(n=16, seed=0):
    rng = np.random.RandomState(seed)
    return FrameFeatures(
        uv=jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32)),
        uv_und=jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32)),
        response=jnp.ones(n, jnp.float32),
        level=jnp.zeros(n, jnp.int32),
        angle=jnp.zeros(n, jnp.float32),
        desc=jnp.asarray(rng.randint(0, 2**32, (n, 8), dtype=np.uint32)),
        valid=jnp.ones(n, bool),
    )


def _map(max_kf=8, max_mp=64, n_feat=16):
    return ms.empty_map(max_kf, max_mp, n_feat)


class TestAddKeyframe:
    def test_add_and_slot(self):
        m = _map()
        no = jnp.full((16,), ms.NO_MP, jnp.int32)
        m, k0 = ms.add_keyframe(m, _feats(), jnp.eye(4), 0.0, no, -1)
        m, k1 = ms.add_keyframe(m, _feats(seed=1), jnp.eye(4), 0.1, no, 0)
        assert int(k0) == 0 and int(k1) == 1
        assert int(m.n_kf) == 2
        assert bool(m.kf_valid[0]) and bool(m.kf_valid[1])
        assert int(m.kf_parent[1]) == 0

    def test_capacity_overflow(self):
        m = _map(max_kf=2)
        no = jnp.full((16,), ms.NO_MP, jnp.int32)
        for i in range(3):
            m, k = ms.add_keyframe(m, _feats(), jnp.eye(4), 0.0, no, -1)
        assert int(k) == -1
        assert int(m.n_kf) == 2


class TestMapPoints:
    def _setup_two_kfs(self):
        m = _map()
        no = jnp.full((16,), ms.NO_MP, jnp.int32)
        m, _ = ms.add_keyframe(m, _feats(), jnp.eye(4), 0.0, no, -1)
        m, _ = ms.add_keyframe(m, _feats(seed=1), jnp.eye(4), 0.1, no, 0)
        return m

    def test_add_mappoints(self):
        m = self._setup_two_kfs()
        B = 4
        pos = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (B, 3))
                          .astype(np.float32))
        ok = jnp.asarray([True, True, False, True])
        desc = jnp.zeros((B, 8), jnp.uint32)
        fa = jnp.asarray([0, 1, 2, 3], jnp.int32)
        fb = jnp.asarray([4, 5, 6, 7], jnp.int32)
        m, slots = ms.add_mappoints(m, pos, ok, desc, 0, 0, fa, 1, fb)
        s = np.asarray(slots)
        assert list(s) == [0, 1, -1, 2]
        assert int(m.n_mp) == 3
        # associations written in both KFs for created points only
        assert int(m.kf_mp[0, 0]) == 0 and int(m.kf_mp[1, 4]) == 0
        assert int(m.kf_mp[0, 2]) == ms.NO_MP
        assert bool(m.mp_valid[2]) and not bool(m.mp_valid[3])

    def test_covisibility(self):
        m = self._setup_two_kfs()
        B = 6
        pos = jnp.ones((B, 3), jnp.float32)
        ok = jnp.ones(B, bool)
        m, _ = ms.add_mappoints(m, pos, ok, jnp.zeros((B, 8), jnp.uint32),
                                0, 0, jnp.arange(B, dtype=jnp.int32),
                                1, jnp.arange(B, dtype=jnp.int32))
        W = ms.covisibility_matrix(m)
        assert int(W[0, 1]) == 6 and int(W[1, 0]) == 6
        assert int(W[0, 0]) == 0
        row = ms.covisibility_row(m, jnp.int32(0))
        assert int(row[1]) == 6

    def test_erase_mappoints(self):
        m = self._setup_two_kfs()
        B = 3
        m, slots = ms.add_mappoints(
            m, jnp.ones((B, 3)), jnp.ones(B, bool), jnp.zeros((B, 8), jnp.uint32),
            0, 0, jnp.arange(B, dtype=jnp.int32), 1, jnp.arange(B, dtype=jnp.int32))
        m = ms.erase_mappoints(m, jnp.asarray([1, -1], jnp.int32))
        assert not bool(m.mp_valid[1])
        assert int(m.kf_mp[0, 1]) == ms.NO_MP
        assert int(m.kf_mp[0, 0]) == 0  # untouched

    def test_replace_mappoint(self):
        m = self._setup_two_kfs()
        B = 3
        m, _ = ms.add_mappoints(
            m, jnp.ones((B, 3)), jnp.ones(B, bool), jnp.zeros((B, 8), jnp.uint32),
            0, 0, jnp.arange(B, dtype=jnp.int32), 1, jnp.arange(B, dtype=jnp.int32))
        m = ms.replace_mappoint(m, jnp.asarray([0], jnp.int32),
                                jnp.asarray([2], jnp.int32))
        assert int(m.kf_mp[0, 0]) == 2
        assert not bool(m.mp_valid[0])
        assert bool(m.mp_valid[2])

    def test_erase_keyframe(self):
        m = self._setup_two_kfs()
        no = jnp.full((16,), ms.NO_MP, jnp.int32)
        m, k2 = ms.add_keyframe(m, _feats(seed=2), jnp.eye(4), 0.2, no, 1)
        m = ms.erase_keyframe(m, jnp.int32(1))
        assert not bool(m.kf_valid[1])
        # child re-parents to erased KF's parent
        assert int(m.kf_parent[int(k2)]) == 0
