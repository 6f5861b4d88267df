"""Device inventory (the reference's stat/device_query.cu analogue)."""

from __future__ import annotations


def device_report() -> str:
    """Human-readable device summary, like device_query printed GPU
    properties (stat/device_query.cu, captured in stat/sys_info.txt)."""
    import jax

    lines = []
    for d in jax.devices():
        lines.append(
            f"device {d.id}: platform={d.platform} kind={d.device_kind} "
            f"process={d.process_index}")
    try:
        cpu = jax.devices("cpu")
        lines.append(f"host cpu devices: {len(cpu)}")
    except RuntimeError:
        pass
    lines.append(f"jax {jax.__version__}; default backend "
                 f"{jax.default_backend()}")
    return "\n".join(lines)


if __name__ == "__main__":
    print(device_report())
