from njode_tpu.data.grid import GridBatch  # noqa: F401
