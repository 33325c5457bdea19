"""Host-side mesh generation benchmarks, mirroring the reference's criterion
harnesses (benches/large_mesh_benchmark.rs, mesh_benchmark.rs,
mesh_smoothing_benchmark.rs, delaunay_voronoi_benchmark.rs).

Prints one JSON line per benchmark: {"name", "cells", "seconds"}.
"""

import json
import time


def _bench(name, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    cells = out.num_cells if hasattr(out, "num_cells") else None
    print(json.dumps({"name": name, "cells": cells,
                      "seconds": round(dt, 2)}))
    return out


def main():
    from cfd2_tpu.mesh import (
        ChannelWithObstacle,
        generate_cut_cell_mesh,
        generate_delaunay_mesh,
        generate_voronoi_mesh,
    )

    geo = ChannelWithObstacle(length=3.0, height=1.0,
                              obstacle_center=(1.0, 0.5), obstacle_radius=0.2)
    dom = (3.0, 1.0)

    # mesh_benchmark.rs sizes
    for h in (0.05, 0.02):
        _bench(f"cutcell_{h}", lambda h=h: generate_cut_cell_mesh(
            geo, h, h, 1.2, dom))

    # mesh_profile.rs: 0.00175 (~1M cells)
    m = _bench("cutcell_0.00175", lambda: generate_cut_cell_mesh(
        geo, 0.00175, 0.00175, 1.2, dom))

    # mesh_smoothing_benchmark.rs: 10 smoothing iterations at 0.00175
    t0 = time.time()
    m.smooth(geo, 0.0, 10)   # target 0 -> run all 10 iterations
    print(json.dumps({"name": "smooth10_0.00175", "cells": m.num_cells,
                      "seconds": round(time.time() - t0, 2)}))

    # large_mesh_benchmark.rs: 0.001 (~3M cells, 60s budget in the reference)
    _bench("cutcell_0.001", lambda: generate_cut_cell_mesh(
        geo, 0.001, 0.001, 1.2, dom))

    # delaunay_voronoi_benchmark.rs: 0.01 and 0.005
    for h in (0.01, 0.005):
        _bench(f"delaunay_{h}", lambda h=h: generate_delaunay_mesh(
            geo, h, h, 1.2, dom))
    _bench("voronoi_0.01", lambda: generate_voronoi_mesh(
        geo, 0.01, 0.01, 1.2, dom))


if __name__ == "__main__":
    main()
