from python_async_sample_spark.pipelines.rot_pipeline import RotOutput, run_rot

__all__ = ["RotOutput", "run_rot"]
