import sys as _s, os as _o
_s.path.insert(0, _o.path.join(_o.path.dirname(__file__), ".."))
from multi_orbslam3_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import time, numpy as np
from multi_orbslam3_tpu import config as cfg
from multi_orbslam3_tpu.collab.client import CollabClient
from multi_orbslam3_tpu.collab.server import CollabServer
from multi_orbslam3_tpu.collab.transport import InProcessTransport
from multi_orbslam3_tpu.dataio import synthetic
from multi_orbslam3_tpu.eval.benchmarks import _euroc_scale_config
c = _euroc_scale_config()
n_agents, n_frames = 2, 150
seqs = [synthetic.make_sequence(c, n_frames=n_frames, n_points=1200, seed=31,
                                trajectory="circle", phase=1.1+0.55*a, arc=2.3*np.pi)
        for a in range(n_agents)]
tr = InProcessTransport()
clients = [CollabClient(c, a, tr) for a in range(n_agents)]
server = CollabServer(c, tr, n_agents=n_agents)
t_cl = [0.0]*n_agents; t_clcomm = 0.0; t_srv = 0.0
t00 = time.perf_counter()
for i in range(n_frames):
    ft0 = time.perf_counter()
    for a, cl in enumerate(clients):
        t0 = time.perf_counter()
        cl.process_frame(seqs[a].images[i], float(seqs[a].timestamps[i]))
        t1 = time.perf_counter(); t_cl[a] += t1-t0
        cl.comm_cycle()
        t_clcomm += time.perf_counter()-t1
    t2 = time.perf_counter()
    server.comm_cycle()
    t_srv += time.perf_counter()-t2
    if i % 10 == 9:
        print(f"f{i+1}: frame {time.perf_counter()-ft0:.2f}s cum: cl={sum(t_cl):.1f} clcomm={t_clcomm:.1f} srv={t_srv:.1f} total={time.perf_counter()-t00:.1f} srv_stats={dict(server.stats)}", flush=True)
server.drain_gba()
print("DONE", time.perf_counter()-t00)
