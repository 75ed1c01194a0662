"""CLI entry points (counterparts of the reference's script/ drivers).

Shared flag: every CLI takes ``--platform {cpu,tpu}`` to pin the jax
backend in-process. Environment variables are too late here — the
container pre-imports jax on the remote-TPU backend via sitecustomize, so
``JAX_PLATFORMS=cpu`` is silently ignored; correctness drives that must
not touch the chip (e.g. while a benchmark owns it) need the in-process
``jax.config.update``.
"""

from __future__ import annotations


def add_platform_arg(parser) -> None:
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="pin the jax backend in-process (env vars are ignored: jax "
        "is pre-imported on the remote-TPU backend); use --platform cpu "
        "for correctness drives that must not touch the chip",
    )


def apply_platform(args) -> None:
    platform = getattr(args, "platform", None)
    if platform:
        import jax

        if platform == "tpu" and jax.default_backend() == "tpu":
            # Already on a TPU-class backend. Do NOT force the platform
            # name: remote-TPU plugins register under their own name
            # (e.g. 'axon') while still reporting default_backend()=='tpu',
            # and pinning jax_platforms='tpu' there fails at first use
            # with "No jellyfish device found".
            return
        jax.config.update("jax_platforms", platform)
