"""End-to-end unstructured (banded-path) bench: delaunay/voronoi steps on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import bench_sweep

mt = os.environ.get("UB_TYPE", "delaunay")
size = float(os.environ.get("UB_SIZE", "0.02"))
bench_sweep.bench_one(size, precond=int(os.environ.get("UB_PRECOND", "1")),
                      mesh_type=mt)
