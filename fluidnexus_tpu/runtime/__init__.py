from fluidnexus_tpu.runtime.native_loader import NativeImageLoader, decode_png, native_available  # noqa: F401
