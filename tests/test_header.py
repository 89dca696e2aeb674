"""Container header tests — mirrors reference test/test_header.cpp."""

import numpy as np
import pytest

from cloudini_tpu import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
    decode_header,
    encode_header,
    encoding_info_from_yaml,
    encoding_info_to_yaml,
)


def _info(version=5):
    return EncodingInfo(
        fields=(
            PointField("x", 0, FieldType.FLOAT32, 0.001),
            PointField("y", 4, FieldType.FLOAT32, 0.001),
            PointField("z", 8, FieldType.FLOAT32, 0.001),
            PointField("ring", 12, FieldType.UINT16),
            PointField("t", 14, FieldType.FLOAT64),
        ),
        width=1234, height=2, point_step=22,
        encoding_opt=EncodingOptions.LOSSY, compression_opt=CompressionOption.ZSTD,
        version=version,
    )


def test_yaml_roundtrip():
    info = _info()
    text = encoding_info_to_yaml(info)
    back = encoding_info_from_yaml(text)
    assert back == info


def test_header_roundtrip_yaml_and_binary():
    info = _info()
    for binary in (False, True):
        blob = encode_header(info, binary=binary)
        back, consumed = decode_header(blob)
        assert consumed == len(blob)
        assert back == info


@pytest.mark.parametrize("version", [3, 4, 5])
def test_magic_version_strings(version):
    blob = encode_header(_info(version))
    assert blob[:12] == f"CLOUDINI_V{version:02d}".encode()


def test_magic_version_is_authoritative_over_yaml():
    info = _info(version=5)
    blob = bytearray(encode_header(info))
    blob[10:12] = b"04"  # rewrite magic digits only
    back, _ = decode_header(bytes(blob))
    assert back.version == 4  # YAML still says 5; magic wins (cloudini.cpp:388-392)


def test_truncated_magic_rejected():
    blob = encode_header(_info())
    with pytest.raises(ValueError):
        decode_header(blob[:8])
    with pytest.raises(ValueError):
        decode_header(b"CLOUDINI_X" + blob[10:])


def test_missing_yaml_terminator_rejected():
    blob = encode_header(_info())
    assert blob.endswith(b"\0")
    with pytest.raises(ValueError):
        decode_header(blob[:-1] + b"x")


def test_unsupported_version_rejected():
    blob = bytearray(encode_header(_info()))
    blob[10:12] = b"09"
    with pytest.raises(ValueError):
        decode_header(bytes(blob))
    blob[10:12] = b"01"
    with pytest.raises(ValueError):
        decode_header(bytes(blob))


def test_header_bytes_match_oracle(oracle):
    for version in (3, 4, 5):
        info = _info(version)
        assert encode_header(info) == oracle.header(info)
    # resolution formatting edge cases (ostream %g equivalence)
    for res in (0.1, 0.25, 1e-6, 12345.678, 0.001):
        info = EncodingInfo(
            fields=(PointField("x", 0, FieldType.FLOAT32, res),),
            width=1, height=1, point_step=4,
        )
        assert encode_header(info) == oracle.header(info)


def test_encoding_config_passthrough(oracle):
    info = _info().with_(encoding_config="some_future_config=1")
    assert encode_header(info) == oracle.header(info)
    back, _ = decode_header(encode_header(info))
    assert back.encoding_config == "some_future_config=1"
