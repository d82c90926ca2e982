"""Gymnasium id registration, kept free of heavy imports.

``import red_gym_tpu`` must stay cheap (the package lazy-imports jax/env
everywhere else), so registering ``f110-v0`` — the reference's gym id,
gym/f110_gym/__init__.py:1-5 — goes through this module, which imports
ONLY gymnasium: entry points are strings, resolved by gymnasium at
``make()`` time, so the adapter (and with it jax, the env, the scan ops)
loads on first use rather than at package import.
"""


def register():
    """Idempotently register ``f110-v0`` with gymnasium.  The vector entry
    point serves ``gymnasium.make_vec("f110-v0", num_envs=...)`` with the
    on-device batch (:mod:`red_gym_tpu.gym_vector`).  Raises ImportError
    when gymnasium is not installed."""
    import gymnasium

    if "f110-v0" not in gymnasium.registry:
        try:
            gymnasium.register(
                id="f110-v0",
                entry_point="red_gym_tpu.gym_adapter:F110GymnasiumEnv",
                vector_entry_point="red_gym_tpu.gym_vector:F110VectorEnv")
        except TypeError:
            # gymnasium < 1.0 has no vector_entry_point kwarg; register
            # the single-env entry point so plain make() still works
            gymnasium.register(
                id="f110-v0",
                entry_point="red_gym_tpu.gym_adapter:F110GymnasiumEnv")
