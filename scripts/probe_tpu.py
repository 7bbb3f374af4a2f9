"""Probe axon-tunnel health: run one tiny matmul on the TPU.

Exit codes: 0 = healthy, 3 = wedged (execution hung), 4 = no TPU device.
A wedged tunnel (known environment failure mode: every non-constant-folded
execution hangs at ``array.py:_value``) only recovers after the chip sits
idle, so callers should back off several minutes between probes.
"""

import os
import sys
import threading


def main(deadline_s: float = 150.0) -> None:
    timer = threading.Timer(deadline_s, lambda: os._exit(3))
    timer.daemon = True
    timer.start()
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    if not devs or devs[0].platform in ("cpu", "gpu"):
        os._exit(4)
    x = jnp.ones((256, 256))
    y = float((x @ x).sum())
    timer.cancel()
    print(f"tpu healthy: {devs[0]} matmul={y:.0f}", flush=True)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 150.0)
