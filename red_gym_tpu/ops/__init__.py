from red_gym_tpu.ops import dynamics, integrate  # noqa: F401
