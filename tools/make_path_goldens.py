"""Generate the path-mode regression goldens (tests/goldens/path_*.pfm).

Run ON THE CPU BACKEND (the platform the test suite pins) and ONLY when an
intentional estimator change is understood and documented — the goldens
pin this framework's own output (tests/test_golden_path.py), so silently
regenerating them after an unexplained diff defeats their purpose.

    python tools/make_path_goldens.py [name ...]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# the env var alone is not enough when an accelerator PJRT plugin was
# registered at interpreter startup (axon sitecustomize) — pin the config
# knob before any backend initializes, like tests/conftest.py does
jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import test_golden_path as g  # noqa: E402  (the specs live with the test)

from rayito_tpu.utils.image import write_pfm  # noqa: E402


def main(names):
    os.makedirs(g.GOLDEN_DIR, exist_ok=True)
    for name in names or sorted(g.SPECS):
        img = g.render_snapshot(name)
        path = os.path.join(g.GOLDEN_DIR, f"path_{name}.pfm")
        write_pfm(path, img)
        print(f"{path}: {img.shape} mean={img.mean():.5f}")


if __name__ == "__main__":
    main(sys.argv[1:])
