import time, json
import kvazaar_tpu
kvazaar_tpu.enable_compile_cache()
import bench
from kvazaar_tpu.profiler import phases
t0 = time.time()
fps = bench.measure_preset_fps_ours("veryslow", 1920, 1080, 27, timed=8)
print(json.dumps({"veryslow_fps": round(fps, 4), "total_s": round(time.time()-t0, 1),
  "stages": {k: [round(s,2), c] for k, (s,c) in sorted(phases.as_dict().items(), key=lambda kv: -kv[1][0])}}), flush=True)
