"""Collaborative client: MonoSlam + uplink/downlink communication.

Replaces the reference ClientSystem + Communicator client half
(src/Communicator.cc RunClient/PublishMapClient/ProcessKfInClient):
loop closing stays off (the server owns place recognition,
src/LocalMapping.cc:40-45), new/changed keyframes and landmarks are
drained into MapDelta envelopes under per-cycle budget bounds, and
incoming server corrections are applied only when pose-locked —
the reference's convergence rule (KeyFrame.cc:2143-2144): *server wins
after optimization, client wins for fresh odometry*.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from multi_orbslam3_tpu.collab import protocol
from multi_orbslam3_tpu.collab.transport import Transport
from multi_orbslam3_tpu.config import SystemConfig
from multi_orbslam3_tpu.map import mapstate as ms
from multi_orbslam3_tpu.pipeline.system import MonoSlam


class CollabClient:
    def __init__(self, config: SystemConfig, agent_id: int,
                 transport: Transport, inertial: bool = False):
        self.cfg = config
        self.agent = agent_id
        self.transport = transport
        self.inertial = inertial
        if inertial:
            from multi_orbslam3_tpu.pipeline.inertial_system import \
                MonoInertialSlam
            self.slam = MonoInertialSlam(config, agent_id,
                                         enable_loop_closing=False)
        else:
            self.slam = MonoSlam(config, agent_id, enable_loop_closing=False)
        self._sent_kf = 0               # slots < _sent_kf were sent in full
        self._sent_mp = 0
        self._sent_kf_pose = np.zeros((config.map.max_keyframes, 4, 4),
                                      np.float32)
        self._sent_mp_pos = np.zeros((config.map.max_mappoints, 3),
                                     np.float32)
        self._seq = 0
        self.stats = {"deltas_sent": 0, "corrections_applied": 0}

    # ------------------------------------------------------------------
    def process_frame(self, img: np.ndarray, timestamp: float):
        state = self.slam.process_frame(img, timestamp)
        return state

    def process_frame_imu(self, img: np.ndarray, timestamp: float,
                          acc: np.ndarray, gyro: np.ndarray,
                          dt: np.ndarray):
        return self.slam.process_frame_imu(img, timestamp, acc, gyro, dt)

    # ------------------------------------------------------------------
    def comm_cycle(self) -> None:
        """One communication cycle: ingest corrections, publish deltas
        (reference Communicator::RunClient, src/Communicator.cc:164-230)."""
        self._ingest_corrections()
        delta = self._build_delta()
        if delta is not None:
            self.transport.send_up(self.agent, delta.to_bytes())
            self.stats["deltas_sent"] += 1

    # ------------------------------------------------------------------
    def _build_delta(self) -> Optional[protocol.MapDelta]:
        # inertial clients publish nothing until visual-inertial init
        # stage 1 passed (the reference's GetInertialBA1 uplink gate,
        # Atlas.cc:134,155)
        if self.inertial and not getattr(self.slam, "inertial_ready", False):
            return None
        m = self.slam.m
        comm = self.cfg.comm
        # IMU-init gauge handoff (mScale/mRgw, Map.cc:497-503): the server
        # transforms its copy of our map; refresh the sent-pose mirrors so
        # the re-gauge itself emits no per-entity updates
        gauge = getattr(self.slam, "pending_gauge", None)
        scale, R_gw = (1.0, None) if gauge is None else gauge
        if gauge is not None:
            self.slam.pending_gauge = None
            self._sent_kf_pose[:self._sent_kf] = \
                np.array(m.kf_pose[:self._sent_kf])
            self._sent_mp_pos[:self._sent_mp] = \
                np.array(m.mp_pos[:self._sent_mp])
        n_kf = int(m.n_kf)
        n_mp = int(m.n_mp)
        new_kf_hi = min(n_kf, self._sent_kf + comm.client_kf_bound)
        new_mp_hi = min(n_mp, self._sent_mp + comm.client_mp_bound)
        kfs = kf_updates = mps = mp_updates = None

        if new_kf_hi > self._sent_kf:
            sl = slice(self._sent_kf, new_kf_hi)
            poses = np.array(m.kf_pose[sl.start:sl.stop])
            B = new_kf_hi - self._sent_kf
            local_ids = np.arange(self._sent_kf, new_kf_hi, dtype=np.int32)
            # reference chain: predecessor, pred-of-pred, spanning parent
            parent = np.array(m.kf_parent[sl.start:sl.stop])
            ref_ids = np.stack([local_ids - 1, local_ids - 2, parent], 1)
            ref_ids = np.where(ref_ids >= 0, ref_ids, -1).astype(np.int32)
            T_rel = np.zeros((B, 3, 4, 4), np.float32)
            all_poses = np.array(m.kf_pose)
            for b in range(B):
                for r in range(3):
                    rid = ref_ids[b, r]
                    if rid >= 0:
                        T_rel[b, r] = poses[b] @ np.linalg.inv(all_poses[rid])
            kfs = protocol.KFPayload(
                agent=self.agent, local_id=local_ids,
                timestamp=np.array(m.kf_timestamp[sl.start:sl.stop]),
                ref_ids=ref_ids, T_rel=T_rel, T_abs=poses,
                is_first=(local_ids == 0),
                uv=np.array(m.kf_uv[sl.start:sl.stop]),
                desc=np.array(m.kf_desc[sl.start:sl.stop]),
                level=np.array(m.kf_level[sl.start:sl.stop]),
                angle=np.array(m.kf_angle[sl.start:sl.stop]),
                feat_valid=np.array(m.kf_feat_valid[sl.start:sl.stop]),
                mp_local=np.array(m.kf_mp[sl.start:sl.stop]))
            self._sent_kf_pose[sl.start:sl.stop] = poses

        if new_mp_hi > self._sent_mp:
            sl = slice(self._sent_mp, new_mp_hi)
            local_ids = np.arange(self._sent_mp, new_mp_hi, dtype=np.int32)
            ref_kf = np.array(m.mp_ref_kf[sl.start:sl.stop])
            pos_abs = np.array(m.mp_pos[sl.start:sl.stop])
            all_poses = np.array(m.kf_pose)
            ref_safe = np.maximum(ref_kf, 0)
            # position in reference-KF camera frame (relative encoding,
            # MP.msg mSendWithKF semantics)
            pos_rel = np.einsum("bij,bj->bi",
                                all_poses[ref_safe][:, :3, :3], pos_abs) \
                + all_poses[ref_safe][:, :3, 3]
            mps = protocol.MPPayload(
                agent=self.agent, local_id=local_ids, ref_kf_local=ref_kf,
                pos_rel=pos_rel.astype(np.float32), pos_abs=pos_abs,
                desc=np.array(m.mp_desc[sl.start:sl.stop]))
            self._sent_mp_pos[sl.start:sl.stop] = pos_abs

        # pose updates for already-sent KFs whose pose moved (SendMe analog)
        if self._sent_kf > 0:
            cur = np.array(m.kf_pose[:self._sent_kf])
            moved = np.abs(cur - self._sent_kf_pose[:self._sent_kf]) \
                .reshape(self._sent_kf, -1).max(axis=1) > 1e-6
            locked = np.array(m.kf_pose_locked[:self._sent_kf])
            moved = moved & ~locked     # never push back over a server lock
            if moved.any():
                ids = np.nonzero(moved)[0].astype(np.int32)
                ids = ids[:comm.client_kf_bound]
                kf_updates = protocol.KFUpdatePayload(
                    agent=self.agent, local_id=ids, T_abs=cur[ids],
                    locked=np.zeros(len(ids), bool))
                self._sent_kf_pose[ids] = cur[ids]
        if self._sent_mp > 0:
            curp = np.array(m.mp_pos[:self._sent_mp])
            movedp = np.abs(curp - self._sent_mp_pos[:self._sent_mp])\
                .max(axis=1) > 1e-6
            if movedp.any():
                ids = np.nonzero(movedp)[0].astype(np.int32)
                ids = ids[:comm.client_mp_bound]
                mp_updates = protocol.MPUpdatePayload(
                    agent=self.agent, local_id=ids, pos_abs=curp[ids],
                    locked=np.zeros(len(ids), bool))
                self._sent_mp_pos[ids] = curp[ids]

        self._sent_kf = new_kf_hi
        self._sent_mp = new_mp_hi
        if kfs is None and mps is None and kf_updates is None \
                and mp_updates is None and gauge is None:
            return None
        self._seq += 1
        return protocol.MapDelta(
            agent=self.agent, seq=self._seq, kfs=kfs, kf_updates=kf_updates,
            mps=mps, mp_updates=mp_updates,
            closest_kf=self.slam.ref_kf, scale=scale, R_gw=R_gw,
            inertial=self.inertial)

    # ------------------------------------------------------------------
    def _ingest_corrections(self) -> None:
        """Apply server downlink: only pose-locked updates
        (ProcessKfInClient, src/Communicator.cc:1324-1403)."""
        for payload in self.transport.poll_down(self.agent):
            delta = protocol.MapDelta.from_bytes(payload)
            m = self.slam.m
            if delta.kf_updates is not None:
                ku = delta.kf_updates
                apply = np.asarray(ku.locked, bool)
                if apply.any():
                    ids = jnp.asarray(ku.local_id[apply], jnp.int32)
                    m = m._replace(
                        kf_pose=m.kf_pose.at[ids].set(
                            jnp.asarray(ku.T_abs[apply])),
                        kf_pose_locked=m.kf_pose_locked.at[ids].set(True))
                    self.stats["corrections_applied"] += int(apply.sum())
                    self._sent_kf_pose[ku.local_id[apply]] = ku.T_abs[apply]
            if delta.mp_updates is not None:
                mu = delta.mp_updates
                apply = np.asarray(mu.locked, bool)
                if apply.any():
                    ids = jnp.asarray(mu.local_id[apply], jnp.int32)
                    m = m._replace(mp_pos=m.mp_pos.at[ids].set(
                        jnp.asarray(mu.pos_abs[apply])))
                    self._sent_mp_pos[mu.local_id[apply]] = mu.pos_abs[apply]
            if delta.erased_kf is not None:
                # server culled these keyframes (ProcessErasedKf flow)
                for lid in delta.erased_kf:
                    lid = int(lid)
                    if lid != self.slam.ref_kf and 0 <= lid < int(m.n_kf):
                        m = ms.erase_keyframe(m, jnp.int32(lid))
            self.slam.m = m
            self.slam.T_cur = np.array(self.slam.m.kf_pose[self.slam.ref_kf]) \
                if bool(self.slam.m.kf_pose_locked[self.slam.ref_kf]) \
                else self.slam.T_cur
