"""Dependency-DAG ordering for multi-table writes.

Pure driver-side Python — the DAG orders *writes* (JDBC sequencing),
not data, so no Spark primitive is involved (ref: config.go:368-599).

Semantics preserved from the reference:
- edges point parent -> child (a table depends on its FK parents);
- insert/update order is topological (parents first);
- delete order is the exact reverse (children first) so FK constraints
  are never violated mid-sync (ref: config.go:562-584);
- ties broken deterministically by sorted name (ref: config.go:530-549);
- cycles are reported as a concrete path (ref: config.go:398-456).
"""

from __future__ import annotations

from mydatasyncer_spark.errors import CycleError, DependencyError


class DependencyGraph:
    """Adjacency-list DAG over table names (ref: config.go:368-395)."""

    def __init__(self, dependencies: dict[str, list[str]]):
        """``dependencies[child] = [parents...]``; all names must be keys."""
        self.nodes = sorted(dependencies)
        known = set(self.nodes)
        self.parents: dict[str, list[str]] = {}
        self.children: dict[str, list[str]] = {n: [] for n in self.nodes}
        for child, parents in dependencies.items():
            for parent in parents:
                if parent not in known:
                    raise DependencyError(child, parent, self.nodes)
            self.parents[child] = sorted(set(parents))
        for child, parents in self.parents.items():
            for parent in parents:
                self.children[parent].append(child)
        for kids in self.children.values():
            kids.sort()

    def topological_order(self) -> list[str]:
        """Kahn's algorithm with a sorted frontier for determinism.

        Parents come before children. Raises :class:`CycleError` with a
        concrete cycle path on failure.
        """
        in_degree = {n: len(self.parents.get(n, [])) for n in self.nodes}
        frontier = sorted(n for n, d in in_degree.items() if d == 0)
        order: list[str] = []
        while frontier:
            node = frontier.pop(0)
            order.append(node)
            changed = False
            for child in self.children[node]:
                in_degree[child] -= 1
                if in_degree[child] == 0:
                    frontier.append(child)
                    changed = True
            if changed:
                frontier.sort()
        if len(order) != len(self.nodes):
            raise CycleError(self._find_cycle_path())
        return order

    def sync_order(self) -> tuple[list[str], list[str]]:
        """(insert_order parent->child, delete_order child->parent)."""
        topo = self.topological_order()
        return topo, list(reversed(topo))

    def _find_cycle_path(self) -> list[str]:
        """DFS back-edge search; returns e.g. ``[a, b, c, a]``."""
        WHITE, GRAY, BLACK = 0, 1, 2
        color = {n: WHITE for n in self.nodes}
        stack: list[str] = []

        def dfs(node: str) -> list[str] | None:
            color[node] = GRAY
            stack.append(node)
            for child in self.children[node]:
                if color[child] == GRAY:
                    i = stack.index(child)
                    return stack[i:] + [child]
                if color[child] == WHITE:
                    found = dfs(child)
                    if found:
                        return found
            stack.pop()
            color[node] = BLACK
            return None

        for node in self.nodes:
            if color[node] == WHITE:
                found = dfs(node)
                if found:
                    return found
        return []  # pragma: no cover — only called when a cycle exists
