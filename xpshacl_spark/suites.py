"""Canonical shape suites.

`transcript_shapes()` is the engine's flagship suite over the
transcripts table — one shape per injected defect class in FIXTURES.md
§1, mirroring the reference example corpus
(/root/reference/data/example_shapes.ttl:5-27 for minCount/datatype/
range; /root/reference/data/synthetic_data_generator.py:66-182 for
pattern/length/logical).
"""

from __future__ import annotations

from typing import Optional

from xpshacl_spark.shapes import (
    Datatype,
    DenseIndex,
    Drift,
    ForeignKey,
    GroupMinCount,
    MaxGap,
    MaxLength,
    MinInclusive,
    Monotonic,
    NotNull,
    Pattern,
    Shape,
    Transition,
    Unique,
)


def transcript_shapes(
    drift: Optional[Drift] = None,
    max_gap_seconds: Optional[float] = None,
) -> list[Shape]:
    shapes = [
        Shape(
            "http://xpshacl.org/spark#TurnRowShape",
            (
                MinInclusive("turn_idx", 0),  # r_range_turn
                Datatype("ts", "timestamp", required=True),  # r_datatype_ts
                Pattern("role", "^[a-z]+$"),  # r_pattern_role
                MaxLength("text", 4000),  # r_maxlen_text
                NotNull("text"),  # r_null_text
            ),
            name="TurnRowShape",
            description="Per-turn row-level checks on the transcript table",
        ),
        Shape(
            "http://xpshacl.org/spark#ToolRefShape",
            (ForeignKey(("tool",), "tools", ("tool",)),),  # r_fk_tool
            name="ToolRefShape",
            description="tool must reference a known tool",
        ),
        Shape(
            "http://xpshacl.org/spark#RoleRefShape",
            (ForeignKey(("role",), "roles", ("role",)),),
            name="RoleRefShape",
            description="role must reference a known role",
        ),
        Shape(
            "http://xpshacl.org/spark#TurnKeyShape",
            (Unique(("conv_id", "turn_idx")),),  # r_dup_turn
            name="TurnKeyShape",
            description="(conv_id, turn_idx) must be unique",
        ),
        Shape(
            "http://xpshacl.org/spark#TsOrderShape",
            (Monotonic(("conv_id",), "turn_idx", "ts"),),  # r_order_ts
            name="TsOrderShape",
            description="ts must be non-decreasing in turn_idx per conversation",
        ),
        Shape(
            "http://xpshacl.org/spark#TurnSeqShape",
            (
                # both ride TsOrderShape's existing (conv_id, turn_idx)
                # window — 3 sequence checks, ONE shuffle+sort total
                DenseIndex(("conv_id",), "turn_idx", "turn_idx"),
                Transition(
                    ("conv_id",),
                    "turn_idx",
                    "role",
                    allowed_prev=(("assistant", ("user", "system", "tool")),),
                    initial=("user", "system", "tool"),
                ),
            ),
            name="TurnSeqShape",
            description=(
                "turn_idx must enumerate each conversation densely from 0; "
                "an assistant turn may only follow a non-assistant turn; "
                "conversations must open with a non-assistant turn"
            ),
        ),
        Shape(
            "http://xpshacl.org/spark#AssistantCardShape",
            (
                GroupMinCount(
                    ("conv_id",), 1, where="role = 'assistant'", column="role"
                ),
            ),  # r_card_asst
            name="AssistantCardShape",
            description="every conversation needs at least one assistant turn",
        ),
    ]
    if max_gap_seconds is not None:
        shapes.append(
            Shape(
                "http://xpshacl.org/spark#LatencyShape",
                # rides TsOrderShape/TurnSeqShape's (conv_id, turn_idx)
                # window — zero extra shuffles
                (MaxGap(("conv_id",), "turn_idx", "ts", max_gap_seconds),),
                name="LatencyShape",
                description=(
                    "consecutive turns must be no more than "
                    f"{max_gap_seconds}s apart"
                ),
            )
        )
    if drift is not None:
        shapes.append(
            Shape(
                "http://xpshacl.org/spark#TextLenDriftShape",
                (drift,),
                name="TextLenDriftShape",
                description="text length distribution vs baseline",
            )
        )
    return shapes
