"""Symbol-mapping parity suite, mirroring every case of
/root/reference/test/symbol_test.c:10-142 (allocation, overwriting insertion,
reset + reuse) plus the round-trip seam between the public SymbolMapping and
the dense-array codebook the kernels use."""

import numpy as np
import pytest

from libhuffman_tpu.ops import hostref
from libhuffman_tpu.symbols import SymbolMapping, SymbolMappingElement


def test_symbol_mapping_allocation():
    # symbol_test.c:10-40: init length, element init (length + coding),
    # insert then get returns the same element.
    mapping = SymbolMapping(10)
    assert mapping.length == 10

    element1 = SymbolMappingElement("1011", 4)
    assert element1.length == 4
    assert element1.coding == "1011"

    mapping.insert(2, element1)
    element2 = mapping.get(2)
    assert element2 is not None
    assert element1 is element2


def test_symbol_mapping_insertion():
    # symbol_test.c:43-85: overlapping insert replaces the occupant; all
    # other slots stay empty (None).
    mapping = SymbolMapping(10)
    element1 = SymbolMappingElement("handsomest", 10)
    element2 = SymbolMappingElement("impedance", 9)
    element3 = SymbolMappingElement("magnanimous", 10)
    element4 = SymbolMappingElement("pitchfork", 9)

    mapping.insert(1, element1)
    mapping.insert(1, element2)  # overwrite frees/drops element1
    mapping.insert(3, element3)
    mapping.insert(4, element4)

    expected = [None, element2, None, element3, element4,
                None, None, None, None, None]
    for i in range(mapping.length):
        assert mapping.get(i) is expected[i]


def test_symbol_mapping_reset():
    # symbol_test.c:88-145: fill, validate, reset -> all None, then refill
    # and validate again (mapping is reusable between blocks).
    mapping = SymbolMapping(5)
    for i in range(mapping.length):
        mapping.insert(i, SymbolMappingElement("value", 5))
    for i in range(mapping.length):
        el = mapping.get(i)
        assert el is not None
        assert el.coding == "value"
        assert el.length == 5

    mapping.reset()
    for i in range(mapping.length):
        assert mapping.get(i) is None

    for i in range(mapping.length):
        mapping.insert(i, SymbolMappingElement("attribute", 9))
    for i in range(mapping.length):
        el = mapping.get(i)
        assert el is not None
        assert el.coding == "attribute"
        assert el.length == 9


def test_element_clamps_to_length():
    # src/symbol.c:10-40 copies exactly ``length`` chars of the coding.
    el = SymbolMappingElement("magnanimous", 10)
    assert el.coding == "magnanimou"
    assert el.length == 10


def test_out_of_range_raises():
    # src/symbol.c:150-155 (routine_inrange_m) rejects positions outside
    # [0, length); Python surfaces that as IndexError.
    mapping = SymbolMapping(4)
    with pytest.raises(IndexError):
        mapping.get(4)
    with pytest.raises(IndexError):
        mapping.insert(-1, SymbolMappingElement("0"))


def test_mapping_matches_encoder_codebook():
    # The public mapping and the dense-array codebook agree: build the code
    # table for a real block (hostref is the oracle-pinned host anchor) and
    # round-trip it through SymbolMapping both ways.
    block = np.frombuffer(b"abracadabra" * 7, np.uint8)
    tree, parent = hostref.build_tree(hostref.histogram(block))
    codes, lengths = hostref.code_table(tree, parent)

    mapping = SymbolMapping.from_code_table(codes, lengths)
    # Every symbol in the block has a coding; absent symbols have none.
    for s in set(block.tolist()):
        el = mapping.get(s)
        assert el is not None and el.length == lengths[s]
        # Leading 0 bit: the unary-root invariant (src/tree.c:410-413).
        assert el.coding.startswith("0")
    assert mapping.get(ord("z")) is None

    codes2, lens2 = mapping.to_arrays()
    assert np.array_equal(lens2, lengths)
    assert np.array_equal(codes2, codes)

    # from_tree (serialized preorder -> codings) agrees with the code table.
    from libhuffman_tpu.format import serialize_tree

    mapping3 = SymbolMapping.from_tree(serialize_tree(tree))
    for s in range(256):
        a, b = mapping.get(s), mapping3.get(s)
        assert (a is None) == (b is None)
        if a is not None:
            assert a.coding == b.coding and a.length == b.length
