"""Pipeline stages: tracking, local mapping, loop closing.

The reference runs these as free-running pthreads coupled by queues and
try-locks (Tracking.cc / LocalMapping.cc / LoopClosing.cc +
CentralControl.h:89-98). Here each stage is a host-orchestrated jitted
step over fixed-shape state — the host state machine replaces the lock
protocol, and stage boundaries are explicit data dependencies.
"""
