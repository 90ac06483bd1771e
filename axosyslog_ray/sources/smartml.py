"""Smart multi-line: automatic stack-trace / backtrace reassembly.

A from-scratch re-expression of the reference's smart-multi-line mode
(reference lib/multi-line/smart-multi-line.c:243-405 — FSM transition +
segment accumulation logic; conformance pinned against its own test
corpus lib/multi-line/tests/test_smart_multi_line.c in
tests/test_smart_multiline.py).

The rule table below is DATA, not code: the language-detection regexes
originate from Google's fluent-plugin-detect-exceptions (Apache-2.0),
which the reference ships as `smart-multi-line.fsm` (a TSV of
`from_states  /regexp/  to_state`). They are transcribed here as Python
tuples with the same states and patterns so behavior matches the
reference rule-for-rule.

Execution model: the FSM is inherently sequential per stream (each
line's verdict depends on the previous line's state), so it runs as a
per-batch accumulator inside the text source's framing stage — one
stream per file/block, the same placement as the indented and
regexp-prefix joiners (sources/text.py). Regexes are compiled once per
instance (actor/worker construction), never per batch.
"""

from __future__ import annotations

import re

# (comma-separated from-states, pattern, to-state) — the reference's
# smart-multi-line.fsm rule set (fluent-plugin-detect-exceptions data).
SMART_RULES: list[tuple[str, str, str]] = [
    # java
    ("start_state,java_start_exception",
     r"(?:Exception|Error|Throwable|V8 errors stack trace)[:\r\n]",
     "java_after_exception"),
    ("java_after_exception", r"^[\t ]*nested exception is:[\t ]*", "java_start_exception"),
    ("java_after_exception", r"^[\r\n]*$", "java_after_exception"),
    ("java_after_exception,java", r"^[\t ]+(?:eval )?at ", "java"),
    ("java_after_exception,java", r"^[\t ]+--- End of inner exception stack trace ---$", "java"),
    ("java_after_exception,java",
     r"^--- End of stack trace from previous location where exception was thrown ---$", "java"),
    ("java_after_exception,java", r"^[\t ]*(?:Caused by|Suppressed):", "java_after_exception"),
    ("java_after_exception,java", r"^[\t ]*... \d+ (?:more|common frames omitted)", "java"),
    # python
    ("start_state", r"^Traceback \(most recent call last\):$", "python"),
    ("python", r"^[\t ]*File ", "python_code"),
    ("python_code", r"[^\t ]", "python"),
    ("python", r"^(?:[^\s.():]+\.)*[^\s.():]+:", "start_state"),
    # PHP
    ("start_state",
     r"(?:PHP (?:Notice|Parse error|Fatal error|Warning):)|(?:exception '[^']+' with message ')",
     "php_stack_begin"),
    ("php_stack_begin", r"^Stack trace:", "php_stack_frames"),
    ("php_stack_frames", r"^#\d", "php_stack_frames"),
    ("php_stack_frames", r"^\s+thrown in ", "start_state"),
    # Go
    ("start_state", r"\bpanic: ", "go_after_panic"),
    ("start_state", r"http: panic serving", "go_goroutine"),
    ("go_after_panic,go_after_signal,go_frame_1", r"^$", "go_goroutine"),
    ("go_after_panic", r"^\[signal ", "go_after_signal"),
    ("go_goroutine", r"^goroutine \d+ \[[^\]]+\]:$", "go_frame_1"),
    ("go_frame_1", r"^(?:[^\s.:]+\.)*[^\s.():]+\(|^created by ", "go_frame_2"),
    ("go_frame_2", r"^\s", "go_frame_1"),
    # Ruby
    ("start_state", r"Error \(.*\):$", "ruby_before_rails_trace"),
    ("ruby_before_rails_trace", r"^  $", "ruby"),
    ("ruby_before_rails_trace", r"^[\t ]+.*?\.rb:\d+:in `", "ruby"),
    ("ruby", r"^[\t ]+.*?\.rb:\d+:in `", "ruby"),
    # Dart
    ("start_state", r"^Unhandled exception:$", "dart_exc"),
    ("dart_exc",
     r"^(Instance of)|(Exception)|(Bad state)|(IntegerDivisionByZeroException)|(Invalid argument)"
     r"|(RangeError)|(Assertion failed)|(Cannot instantiate)|(Reading static variable)"
     r"|(UnimplementedError)|(Unsupported operation)|(Concurrent modification)|(Out of Memory)"
     r"|(Stack Overflow)", "dart_stack"),
    ("dart_exc", r"^'.+?':.+?$", "dart_type_err_1"),
    ("dart_type_err_1", r"^#\d+\s+.+?\(.+?\)$", "dart_stack"),
    ("dart_type_err_1", r"^.+?$", "dart_type_err_2"),
    ("dart_type_err_2", r"^.*?\^.*?$", "dart_type_err_3"),
    ("dart_type_err_3", r"^$", "dart_type_err_4"),
    ("dart_type_err_4", r"^$", "dart_stack"),
    ("dart_exc", r"^FormatException", "dart_format_err_1"),
    ("dart_format_err_1", r"^#\d+\s+.+?\(.+?\)$", "dart_stack"),
    ("dart_format_err_1", r"^.", "dart_format_err_2"),
    ("dart_format_err_2", r"^.*?\^", "dart_format_err_3"),
    ("dart_format_err_3", r"^$", "dart_stack"),
    ("dart_exc", r"^NoSuchMethodError:", "dart_method_err_1"),
    ("dart_method_err_1", r"^Receiver:", "dart_method_err_2"),
    ("dart_method_err_2", r"^Tried calling:", "dart_method_err_3"),
    ("dart_method_err_3", r"^Found:", "dart_stack"),
    ("dart_method_err_3", r"^#\d+\s+.+?\(.+?\)$", "dart_stack"),
    ("dart_stack", r"^#\d+\s+.+?\(.+?\)$", "dart_stack"),
    ("dart_stack", r"^<asynchronous suspension>$", "dart_stack"),
]

START = "start_state"


class SmartMultiLine:
    """Sequential accumulator: feed() lines, get completed messages.

    Mirrors _process_segment + _accumulate_line_unlocked
    (smart-multi-line.c:266-405): a line is part of a trace if a rule
    from the current state matches (falling back to one retry from
    start_state — a new trace can begin right after another ends); a
    trace message is extracted when a non-trace line arrives (which is
    then re-examined on its own), when a rule returns to start_state,
    or when a new trace starts."""

    def __init__(self, rules: list[tuple[str, str, str]] | None = None):
        self.rules_by_state: dict[str, list[tuple[re.Pattern, str]]] = {}
        for from_states, pattern, to_state in (rules or SMART_RULES):
            compiled = re.compile(pattern)
            for st in from_states.split(","):
                self.rules_by_state.setdefault(st, []).append((compiled, to_state))
        self.state = START
        self.buffer: list[str] = []

    def _transition(self, segment: str) -> bool:
        for rx, to_state in self.rules_by_state.get(self.state, ()):
            # pcre match semantics: unanchored search; the rules anchor
            # themselves with ^/$ where needed
            if rx.search(segment):
                self.state = to_state
                return True
        self.state = START
        return False

    def _process(self, segment: str) -> tuple[bool, bool, bool]:
        """(is_part_of_trace, starts_a_new_trace, ends_trace)."""
        last_ended = self.state == START
        if self._transition(segment):
            return True, last_ended, self.state == START
        # retry from start_state: this line may begin a NEW trace
        if self._transition(segment):
            return True, True, self.state == START
        return False, False, False

    def feed(self, line: str) -> list[list[str]]:
        """Feed one line; return zero or more COMPLETED messages (each a
        list of source lines)."""
        is_part, starts_new, ends = self._process(line)
        if not self.buffer:
            if not is_part:
                return [[line]]
            self.buffer = [line]
            return []
        # buffer holds a partial trace (single non-trace lines are
        # never buffered — smart-multi-line.c:399 asserts the same)
        if is_part and starts_new:
            done = self.buffer
            self.buffer = [line]
            return [done]
        if is_part and ends:
            done = self.buffer + [line]
            self.buffer = []
            return [done]
        if is_part:
            self.buffer.append(line)
            return []
        done = self.buffer
        self.buffer = []
        return [done, [line]]

    def flush(self) -> list[list[str]]:
        if not self.buffer:
            return []
        done = self.buffer
        self.buffer = []
        self.state = START
        return [done]


def smart_join(lines: list[str]) -> list[list[str]]:
    """Run one stream of lines through the FSM; returns the grouped
    messages (lists of source lines, flushed at end of stream)."""
    fsm = SmartMultiLine()
    out: list[list[str]] = []
    for line in lines:
        out.extend(fsm.feed(line or ""))
    out.extend(fsm.flush())
    return out
