# sherpa_vietnamese_asr_tpu — TPU-native long-form Vietnamese ASR framework.
#
# Public API mirrors the reference's core package surface
# (reference core/__init__.py:10-53): TranscriberPipeline, overlap merge and
# segment splitting, audio loading, silence detection, VAD, and (as stages
# land) diarization and serialization helpers.

__version__ = "0.1.0"

from sherpa_vietnamese_asr_tpu.utils.jax_setup import ensure_setup as _setup

_setup()

from sherpa_vietnamese_asr_tpu.models.registry import (  # noqa: F401
    MODEL_30M,
    MODEL_68M,
    ROVER_MODEL_ID,
    ROVER_MODEL_IDS,
    AsrModel,
    load_asr_model,
    random_asr_model,
)
from sherpa_vietnamese_asr_tpu.pipeline.chunking import (  # noqa: F401
    find_best_split_point,
    find_silent_regions,
)
from sherpa_vietnamese_asr_tpu.pipeline.merge import (  # noqa: F401
    merge_chunks_with_overlap,
    split_long_segments,
)
from sherpa_vietnamese_asr_tpu.pipeline.asr_json import (  # noqa: F401
    deserialize_segments,
    serialize_segments,
)
from sherpa_vietnamese_asr_tpu.pipeline.diarization import (  # noqa: F401
    SPEAKER_EMBEDDING_MODELS,
    SpeakerDiarizer,
    run_diarization,
)
from sherpa_vietnamese_asr_tpu.pipeline.transcriber import (  # noqa: F401
    TranscriberPipeline,
)
from sherpa_vietnamese_asr_tpu.pipeline.vad import (  # noqa: F401
    get_vad_segments,
)
from sherpa_vietnamese_asr_tpu.utils.audio_io import load_audio  # noqa: F401
