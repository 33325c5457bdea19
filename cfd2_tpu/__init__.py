"""cfd2_tpu — a TPU-native 2D incompressible Navier–Stokes framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
Rust+WGPU solver (TSultanov/cfd-demo2): finite-volume coupled (u,v,p) solve on
unstructured polygonal meshes, FGMRES + SIMPLE/Schur preconditioning with
Chebyshev or AMG pressure relaxation, cut-cell/Delaunay/Voronoi meshing, and
headless visualization — with every per-step computation jitted on device and
zero host round-trips inside the time loop.
"""

__version__ = "0.1.0"
