from audio_training_tpu.data.example import decode_example, encode_example
from audio_training_tpu.data.pipeline import (
    BatchLoader,
    RecordStream,
    build_training_stream,
    find_shards,
    load_meta,
)
from audio_training_tpu.data.preprocess import (
    get_distribution,
    get_weighting,
    make_preprocess_fn,
    weights_to_array,
)
from audio_training_tpu.data.schema import (
    DecodedSample,
    SampleRecord,
    decode_sample,
    encode_sample,
)
from audio_training_tpu.data.tfrecord import (
    TFRecordWriter,
    read_tfrecords,
    write_tfrecords,
)

__all__ = [
    "encode_example",
    "decode_example",
    "SampleRecord",
    "DecodedSample",
    "encode_sample",
    "decode_sample",
    "TFRecordWriter",
    "read_tfrecords",
    "write_tfrecords",
    "RecordStream",
    "BatchLoader",
    "build_training_stream",
    "find_shards",
    "load_meta",
    "make_preprocess_fn",
    "get_distribution",
    "get_weighting",
    "weights_to_array",
]
