from xcube_spark.operators.resampling.affine import affine_transform_dataset
from xcube_spark.operators.resampling.rectify import rectify_dataset
from xcube_spark.operators.resampling.reproject import reproject_dataset
from xcube_spark.operators.resampling.spatial import resample_in_space

__all__ = [
    "affine_transform_dataset",
    "rectify_dataset",
    "reproject_dataset",
    "resample_in_space",
]
