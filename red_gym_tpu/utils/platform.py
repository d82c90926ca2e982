"""Platform selection helper.

Some images pre-import jax with a TPU plugin at interpreter start (via
sitecustomize), which makes the JAX_PLATFORMS env var ineffective.  Setting
``RGT_PLATFORM=cpu`` (or tpu) forces the platform through jax.config, which
still works post-import as long as no backend has initialized.
"""

import os


def apply():
    plat = os.environ.get("RGT_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
