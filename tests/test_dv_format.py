"""Round-trip tests for the deletion-vector bitmap format
(plans/dv.py): standard portable roaring 32-bit containers, the
64-bit RoaringBitmapArray wrapper, and the inline Delta descriptor
encoding. Pure Python — no Spark session needed."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from canvas_data_loader_spark.plans.dv import (
    decode_inline_dv,
    deserialize_rba,
    deserialize_rbm32,
    encode_inline_dv,
    merge_inline_dv,
    serialize_rba,
    serialize_rbm32,
)


class TestRoaring32:
    def test_empty(self):
        assert deserialize_rbm32(serialize_rbm32([]))[0] == []

    def test_array_container(self):
        vals = [0, 1, 5, 100, 65535]
        assert deserialize_rbm32(serialize_rbm32(vals))[0] == vals

    def test_bitmap_container(self):
        # >4096 values in one 16-bit block forces a bitmap container
        vals = sorted(set(range(0, 60000, 7)))
        assert len(vals) > 4096
        assert deserialize_rbm32(serialize_rbm32(vals))[0] == vals

    def test_multiple_keys(self):
        vals = [3, 65536 + 1, 65536 + 9, 3 * 65536]
        assert deserialize_rbm32(serialize_rbm32(vals))[0] == vals

    def test_container_boundary_cardinality(self):
        # exactly 4096 -> array container; 4097 -> bitmap container
        for n in (4096, 4097):
            vals = list(range(n))
            assert deserialize_rbm32(serialize_rbm32(vals))[0] == vals

    def test_offsets_block_consistent(self):
        # the offsets written must point at each container's body
        vals = [1, 2, 70000, 70001]
        buf = serialize_rbm32(vals)
        _, n = struct.unpack_from("<ii", buf, 0)
        assert n == 2
        offsets = struct.unpack_from(f"<{n}i", buf, 8 + 4 * n)
        # first container body begins right after headers+offsets
        assert offsets[0] == 8 + 4 * n + 4 * n
        # second = first + 2 bytes per array value of container one
        assert offsets[1] == offsets[0] + 2 * 2

    @given(
        st.sets(st.integers(min_value=0, max_value=(1 << 32) - 1), max_size=300)
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_property(self, values):
        vals = sorted(values)
        assert deserialize_rbm32(serialize_rbm32(vals))[0] == vals


class TestRoaringBitmapArray:
    def test_cross_high_word(self):
        vals = [0, 1, (1 << 32) - 1, 1 << 32, (1 << 32) + 5, 3 << 32]
        assert deserialize_rba(serialize_rba(vals)) == sorted(vals)

    def test_dedup_and_sort(self):
        assert deserialize_rba(serialize_rba([5, 1, 5, 1])) == [1, 5]

    def test_negative_rejected(self):
        with pytest.raises(ValueError):
            serialize_rba([-1])

    @given(
        st.sets(
            st.integers(min_value=0, max_value=(1 << 40)), max_size=200
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_property(self, values):
        assert deserialize_rba(serialize_rba(list(values))) == sorted(values)


class TestZ85:
    @given(st.binary(max_size=200))
    @settings(max_examples=80, deadline=None)
    def test_roundtrip_with_size_trim(self, data):
        from canvas_data_loader_spark.plans.dv import z85decode, z85encode

        decoded = z85decode(z85encode(data))
        assert decoded[: len(data)] == data
        assert len(decoded) % 4 == 0
        assert all(b == 0 for b in decoded[len(data):])  # zero padding

    def test_invalid_character_raises(self):
        from canvas_data_loader_spark.plans.dv import z85decode

        with pytest.raises(ValueError, match="Z85"):
            z85decode('He"lo')  # '"' is not in the Z85 alphabet

    def test_bad_length_raises(self):
        from canvas_data_loader_spark.plans.dv import z85decode

        with pytest.raises(ValueError, match="multiple of 5"):
            z85decode("abcd")

    def test_overflow_group_raises(self):
        from canvas_data_loader_spark.plans.dv import z85decode

        with pytest.raises(ValueError, match="overflows"):
            z85decode("#####")  # 84 repeated: exceeds 2^32-1


class TestInlineDescriptor:
    def test_roundtrip(self):
        d = encode_inline_dv([7, 3, 3, 99])
        assert d["storageType"] == "i"
        assert d["cardinality"] == 3
        assert d["sizeInBytes"] > 0
        assert decode_inline_dv(d) == [3, 7, 99]

    def test_crc_detects_corruption(self):
        from canvas_data_loader_spark.plans.dv import z85decode, z85encode

        d = encode_inline_dv([1, 2, 3])
        blob = bytearray(z85decode(d["pathOrInlineDv"]))
        blob[4] ^= 0xFF
        d["pathOrInlineDv"] = z85encode(bytes(blob))
        with pytest.raises(ValueError, match="CRC32"):
            decode_inline_dv(d)

    def test_spec_pure_descriptor_without_crc_accepted(self):
        # a descriptor written by a spec-pure writer carries only the
        # bitmap (padded): sizeInBytes trims it and no CRC is expected
        from canvas_data_loader_spark.plans.dv import (
            serialize_rba,
            z85encode,
        )

        data = serialize_rba([5, 9])
        d = {
            "storageType": "i",
            "pathOrInlineDv": z85encode(data),
            "sizeInBytes": len(data),
            "cardinality": 2,
        }
        assert decode_inline_dv(d) == [5, 9]

    def test_unsupported_storage_type(self):
        with pytest.raises(ValueError, match="storageType"):
            decode_inline_dv({"storageType": "u", "pathOrInlineDv": "x"})

    def test_merge_accumulates(self):
        d1 = encode_inline_dv([1, 2])
        d2 = merge_inline_dv(d1, [2, 9])
        assert decode_inline_dv(d2) == [1, 2, 9]
        assert d2["cardinality"] == 3

    def test_merge_from_none(self):
        assert decode_inline_dv(merge_inline_dv(None, [4])) == [4]
