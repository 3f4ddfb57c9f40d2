from .mesh import (quadrant_mesh, batch_sharding, shard_batch,
                   init_distributed, P, NamedSharding)
from .pipeline import (PipelineConfig, make_subtract_detect_pipeline,
                       make_coadd_pipeline, prepare_frame_inputs)

__all__ = ['quadrant_mesh', 'batch_sharding', 'shard_batch',
           'init_distributed', 'P', 'NamedSharding', 'PipelineConfig',
           'make_subtract_detect_pipeline', 'make_coadd_pipeline',
           'prepare_frame_inputs']
