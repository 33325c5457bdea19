"""Re-measure every unstructured/refined BENCH_SWEEP row after banded-path
changes (each row in its own subprocess so one wedge doesn't kill the rest).
Appends JSON rows to stdout; run on the real TPU."""
import os
import subprocess
import sys

CASES = [
    # (env overrides, label)
    ({"UB_TYPE": "voronoi", "UB_SIZE": "0.004"}, "voronoi 116k"),
    ({"UB_TYPE": "delaunay", "UB_SIZE": "0.005"}, "delaunay 145k"),
    ({"UB_TYPE": "delaunay", "UB_SIZE": "0.003"}, "delaunay 403k"),
]


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for env_over, label in CASES:
        env = dict(os.environ, **env_over)
        print(f"# {label}", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(here, "bench_unstructured.py")],
                env=env, timeout=3000, capture_output=True, text=True)
            for ln in r.stdout.splitlines():
                if ln.startswith("{") or ln.startswith("#"):
                    print(ln, flush=True)
            if r.returncode != 0:
                print(f"# {label}: rc={r.returncode}\n{r.stderr[-2000:]}",
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"# {label}: timed out", flush=True)


if __name__ == "__main__":
    main()
