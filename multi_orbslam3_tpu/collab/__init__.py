"""Collaborative client/server layer.

Replaces the reference's CCM-SLAM distribution stack (Communicator.cc,
ClientHandler.cc, ServerSystem.cc, msg/*.msg over ROS topics):

- ``protocol``  — map-delta messages (KF/MP full + reduced updates,
  erasure lists, pose locks, relative-pose encoding with the 3-deep
  reference fallback chain) as array-of-struct numpy payloads;
- ``transport`` — injectable transport (in-process queues for tests and
  single-host runs; the seam where gRPC/DCN slots in, mirroring how the
  reference's Communicator touches ROS only through mPubMap/mSubMap);
- ``client``    — a MonoSlam wrapped with an uplink buffer and a
  corrections inbox;
- ``server``    — shared-arena multi-agent map (sub-map ids instead of
  per-client Atlas objects — merging relabels ids and Sim3-transforms one
  sub-map instead of migrating object graphs), shared BoW database,
  cross-agent place recognition, Sim3 map merge, pose-graph + global BA,
  vicinity downlink with pose locks.
"""
