from dataset_pipeline_tpu.models.lie import SE3, Sim3  # noqa: F401
