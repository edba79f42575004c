from onset_fingerprinting_tpu.realtime.actions import (
    Action,
    Actions,
    Bounds,
    Location,
    ParameterChange,
    ParameterMapper,
    Sample,
)
from onset_fingerprinting_tpu.realtime.engine import (
    EngineState,
    RealtimeEngine,
    make_engine_step,
)
from onset_fingerprinting_tpu.realtime.analysis import (
    OnlineAnalysis,
    detect_onsets_online,
    find_offset,
    quantize_onsets,
    tempo,
)
from onset_fingerprinting_tpu.realtime.setup_io import load_setup, save_setup
