"""Editor panels as data (the reference's ImGui panels, headless).

Each panel's `build()` produces a plain structure a frontend renders; mutations go
back through EditorContext so they hit the undo stack. Reference:
`/root/reference/OxylusEditor/src/Panels/SceneHierarchyPanel.cpp` (entity tree +
drag-reparent), `InspectorPanel.cpp` (per-component field editors),
`ViewportPanel.cpp` (picking + gizmo + play toolbar).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from ..scene import components as C
from .context import EditorContext
from .gizmo import GizmoMode, GizmoOp, gizmo_drag, pick_gizmo_axis


@dataclasses.dataclass
class HierarchyNode:
    entity: int
    name: str
    selected: bool
    children: list["HierarchyNode"]


class SceneHierarchyPanel:
    def __init__(self, ctx: EditorContext):
        self.ctx = ctx

    def build(self) -> list[HierarchyNode]:
        sc = self.ctx.scene
        kids: dict[int, list[int]] = {}
        roots: list[int] = []
        n = sc._alive.shape[0]
        for i in range(n):
            if not sc._alive[i]:
                continue
            p = int(sc._parent[i])
            if p < 0:
                roots.append(i)
            else:
                kids.setdefault(p, []).append(i)

        def node(i: int) -> HierarchyNode:
            return HierarchyNode(
                entity=i,
                name=sc._names[i],
                selected=i in self.ctx.selection,
                children=[node(c) for c in kids.get(i, [])],
            )

        return [node(r) for r in roots]

    def reparent(self, entity: int, new_parent: int | None) -> None:
        self.ctx.scene.set_parent(entity, -1 if new_parent is None else new_parent)

    def rename(self, entity: int, name: str) -> None:
        self.ctx.scene._names[entity] = name


@dataclasses.dataclass
class FieldView:
    name: str
    kind: str       # "float" | "int" | "bool" | "vec" | "enum" | "uuid" | "string"
    value: Any
    enum_values: tuple[str, ...] | None = None


@dataclasses.dataclass
class ComponentView:
    name: str
    fields: list[FieldView]


class InspectorPanel:
    def __init__(self, ctx: EditorContext):
        self.ctx = ctx

    def build(self, entity: int | None = None) -> list[ComponentView]:
        sc = self.ctx.scene
        if entity is None:
            if not self.ctx.selection:
                return []
            entity = self.ctx.selection[0]
        views = []
        for cdef in C.COMPONENTS:
            if cdef.tag or not sc._comp_mask.get(cdef.name, np.zeros(1, bool))[entity]:
                continue
            fields = []
            for f in cdef.fields:
                v = sc.get_field(entity, cdef.name, f.name)
                kind = f.kind.name.lower()
                fields.append(
                    FieldView(
                        name=f.name,
                        kind=kind,
                        value=v.tolist() if hasattr(v, "tolist") else v,
                        enum_values=tuple(f.enum_values) if f.enum_values else None,
                    )
                )
            views.append(ComponentView(name=cdef.name, fields=fields))
        return views

    def edit(self, entity: int, component: str, field: str, value) -> None:
        self.ctx.set_field(entity, component, field, value)

    def add_component(self, entity: int, component: str, **fields) -> None:
        from ..scene.scene import Entity

        Entity(self.ctx.scene, entity).add(component, **fields)

    def remove_component(self, entity: int, component: str) -> None:
        from ..scene.scene import Entity

        Entity(self.ctx.scene, entity).remove(component)


class ViewportPanel:
    """Picking + gizmo interaction against a rendered frame.

    `pick(x, y)` uses the renderer's entity-id visbuffer (render/picking.py keeps
    the reference's one-pixel GPU readback flow); gizmo methods mutate the selected
    entity's TransformComponent through the undo stack."""

    def __init__(self, ctx: EditorContext, width: int = 1920, height: int = 1080):
        self.ctx = ctx
        self.width = width
        self.height = height
        self.gizmo_op = GizmoOp.TRANSLATE
        self.gizmo_mode = GizmoMode.WORLD
        self.snap = 0.0

    def pick(self, visbuffer, x: int, y: int) -> int:
        eid = int(np.asarray(visbuffer)[int(y), int(x)])
        self.ctx.select(eid)
        return eid

    def _transform(self, entity: int):
        sc = self.ctx.scene
        return (
            sc.get_field(entity, "TransformComponent", "position"),
            sc.get_field(entity, "TransformComponent", "rotation"),
            sc.get_field(entity, "TransformComponent", "scale"),
        )

    def pick_axis(self, camera, x: float, y: float) -> int:
        if not self.ctx.selection:
            return -1
        pos, rot, _ = self._transform(self.ctx.selection[0])
        return pick_gizmo_axis(
            camera, x, y, self.width, self.height, pos, rot, self.gizmo_mode
        )

    def drag(self, camera, axis: int, p0, p1) -> dict:
        if not self.ctx.selection:
            return {}
        e = self.ctx.selection[0]
        pos, rot, scale = self._transform(e)
        upd = gizmo_drag(
            camera, self.gizmo_op, axis, p0, p1, self.width, self.height,
            pos, rot, scale, self.gizmo_mode, self.snap,
        )
        for field, value in upd.items():
            self.ctx.set_field(e, "TransformComponent", field, value)
        return upd
