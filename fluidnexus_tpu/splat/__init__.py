from fluidnexus_tpu.splat.background import BackgroundModel, BackgroundParams  # noqa: F401
