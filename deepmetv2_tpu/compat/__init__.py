from deepmetv2_tpu.compat.torch_import import import_torch_checkpoint  # noqa: F401
