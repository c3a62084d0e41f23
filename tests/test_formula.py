"""Formula arity/nesting validation battery (reference event.cpp:140-204)."""

import pytest

from canopy_tpu.errors import (DuplicateElementError, LogicError,
                               ValidityError)
from canopy_tpu.mef.event import (Arg, BasicEvent, Connective, FALSE_EVENT,
                                  Formula, Gate, TRUE_EVENT)


def events(n):
    return [BasicEvent(f"e{i}") for i in range(n)]


def args(n):
    return [Arg(e) for e in events(n)]


class TestArity:
    @pytest.mark.parametrize("conn", [Connective.AND, Connective.OR,
                                      Connective.NAND, Connective.NOR])
    def test_multi_arg_needs_two(self, conn):
        with pytest.raises(ValidityError):
            Formula(conn, args(1))
        Formula(conn, args(2))

    @pytest.mark.parametrize("conn", [Connective.NOT, Connective.NULL])
    def test_unary(self, conn):
        with pytest.raises(ValidityError):
            Formula(conn, args(2))
        Formula(conn, args(1))

    @pytest.mark.parametrize("conn", [Connective.XOR, Connective.IFF,
                                      Connective.IMPLY])
    def test_binary(self, conn):
        with pytest.raises(ValidityError):
            Formula(conn, args(3))
        Formula(conn, args(2))


class TestAtleast:
    def test_requires_min(self):
        with pytest.raises(ValidityError):
            Formula(Connective.ATLEAST, args(3))

    def test_min_at_least_two(self):
        with pytest.raises(ValidityError):
            Formula(Connective.ATLEAST, args(3), min_number=1)

    def test_more_args_than_min(self):
        with pytest.raises(ValidityError):
            Formula(Connective.ATLEAST, args(2), min_number=2)
        Formula(Connective.ATLEAST, args(3), min_number=2)

    def test_min_only_for_counting(self):
        with pytest.raises(LogicError):
            Formula(Connective.AND, args(2), min_number=2)


class TestCardinality:
    def test_requires_min_and_max(self):
        with pytest.raises(ValidityError):
            Formula(Connective.CARDINALITY, args(3), min_number=1)

    def test_max_bounded_by_args(self):
        with pytest.raises(ValidityError):
            Formula(Connective.CARDINALITY, args(2), min_number=1,
                    max_number=3)

    def test_min_leq_max(self):
        with pytest.raises(ValidityError):
            Formula(Connective.CARDINALITY, args(3), min_number=3,
                    max_number=2)

    def test_valid(self):
        f = Formula(Connective.CARDINALITY, args(3), min_number=1,
                    max_number=2)
        assert f.min_number == 1
        assert f.max_number == 2

    def test_max_only_for_cardinality(self):
        with pytest.raises(LogicError):
            Formula(Connective.ATLEAST, args(3), min_number=2, max_number=3)


class TestNesting:
    def test_duplicate_args_rejected(self):
        e = BasicEvent("dup")
        with pytest.raises(DuplicateElementError):
            Formula(Connective.AND, [Arg(e), Arg(e)])

    def test_complement_under_not_rejected(self):
        with pytest.raises(LogicError):
            Formula(Connective.NOT, [Arg(BasicEvent("e"), complement=True)])

    def test_constant_under_not_rejected(self):
        with pytest.raises(LogicError):
            Formula(Connective.NOT, [Arg(TRUE_EVENT)])
        with pytest.raises(LogicError):
            Formula(Connective.NOT, [Arg(FALSE_EVENT)])

    def test_constants_allowed_elsewhere(self):
        Formula(Connective.AND, [Arg(TRUE_EVENT), Arg(BasicEvent("e"))])


class TestSwap:
    def test_swap_replaces(self):
        a, b, c = BasicEvent("a"), BasicEvent("b"), BasicEvent("c")
        f = Formula(Connective.AND, [Arg(a), Arg(b)])
        f.swap(a, c)
        assert [arg.event for arg in f.args] == [c, b]

    def test_swap_duplicate_rejected(self):
        a, b = BasicEvent("a"), BasicEvent("b")
        other_b = BasicEvent("b")
        f = Formula(Connective.AND, [Arg(a), Arg(b)])
        with pytest.raises(DuplicateElementError):
            f.swap(a, other_b)

    def test_swap_missing_rejected(self):
        a, b, c = BasicEvent("a"), BasicEvent("b"), BasicEvent("c")
        f = Formula(Connective.AND, [Arg(a), Arg(b)])
        with pytest.raises(LogicError):
            f.swap(c, a)


class TestUsage:
    def test_args_marked_used(self):
        e = BasicEvent("e")
        assert not e.usage
        Formula(Connective.NULL, [Arg(e)])
        assert e.usage
