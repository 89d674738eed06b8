from remfx_tpu.data.datasets import (  # noqa: F401
    DeviceCachedDataset,
    DynamicEffectDataset,
    EffectDatamodule,
    EffectDataset,
    InferenceDataset,
)
from remfx_tpu.data.sources import (  # noqa: F401
    ChunkSource,
    locate_files,
    select_random_chunk,
    synthetic_chunk,
)
from remfx_tpu.data.wav import read_wav, write_wav  # noqa: F401
