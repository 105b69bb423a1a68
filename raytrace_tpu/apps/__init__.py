"""Science applications (L3): each module exposes a pure compute() returning
arrays and a main() CLI entry point mirroring a reference binary."""
