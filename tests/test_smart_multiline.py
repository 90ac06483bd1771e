"""Smart multi-line FSM conformance — pinned against the reference's own
test corpus (lib/multi-line/tests/test_smart_multi_line.c) plus the
prefix-garbage / prefix-suffix regexp modes (regexp-multi-line.c)."""
import pyarrow as pa
import pytest

from axosyslog_ray.sources.smartml import SmartMultiLine, smart_join
from axosyslog_ray.sources.text import MultiLineJoiner


def msgs(lines):
    return ["\n".join(g) for g in smart_join(lines)]


class TestSmartMultiLineConformance:
    def test_three_unrelated_lines_are_singletons(self):
        # test_smart_multi_line.c:29 three_unrelated_lines_that_are_not_backtraces
        lines = [
            "this is an initial line that is consumed",
            "another line that is not part of a traceback",
            "yet another line that is not part of a traceback",
            "yet-yet another line that is not part of a traceback",
        ]
        assert msgs(lines) == lines

    def test_single_and_multi_line_messages(self):
        # test_smart_multi_line.c:148 feed_smart_multi_line_with_single_and_multi
        trace = [
            "Traceback (most recent call last):",
            'File "./lib/merge-grammar.py", line 62, in <module>',
            '  for line in fileinput.input(openhook=fileinput.hook_encoded("utf-8")):',
            'File "/usr/lib/python3.8/fileinput.py", line 248, in __next__',
            "  line = self._readline()",
            'File "/usr/lib/python3.8/fileinput.py", line 368, in _readline',
            "  return self._readline()",
        ]
        trace2 = [trace[0], trace[1].replace("merge-grammar", "merge-grammar2"), *trace[2:]]
        trace3 = [trace[0], trace[1].replace("merge-grammar", "merge-grammar3"), *trace[2:]]
        lines = (
            ["this is something unrelated",
             "again something unrelated",
             "yet again something unrelated, but 3 tracebacks are COMING"]
            + trace + trace2 + trace3 + ["unrelated line here"]
        )
        out = msgs(lines)
        assert out[:3] == lines[:3]
        assert out[3] == "\n".join(trace)
        assert out[4] == "\n".join(trace2)
        assert out[5] == "\n".join(trace3)
        assert out[6] == "unrelated line here"
        assert len(out) == 7

    def test_python_backtrace_with_trailing_exception_text(self):
        # test_smart_multi_line.c:254 — 'ValueError: ...' ends the trace
        lines = [
            "Traceback (most recent call last):",
            'File "./x.py", line 62, in <module>',
            "  do()",
            "ValueError: whatever exception that happened",
            "next message",
        ]
        out = msgs(lines)
        assert out == ["\n".join(lines[:4]), "next message"]

    def test_java_backtrace_with_caused_by(self):
        # test_smart_multi_line.c:283 test_java_backtrace (abridged tail)
        lines = [
            "java.lang.RuntimeException: javax.mail.SendFailedException: Invalid Addresses;",
            "  nested exception is:",
            "com.sun.mail.smtp.SMTPAddressFailedException: 550 5.7.1 denied",
            "\tat com.nethunt.crm.api.server.adminsync.AutomaticEmailFacade.sendWithSmtp(AutomaticEmailFacade.java:236)",
            "\tat java.base/java.lang.Thread.run(Thread.java:748)",
            "Caused by: javax.mail.SendFailedException: Invalid Addresses;",
            "  nested exception is:",
            "com.sun.mail.smtp.SMTPAddressFailedException: 550 5.7.1 denied",
            "\tat com.sun.mail.smtp.SMTPTransport.rcptTo(SMTPTransport.java:2064)",
            "\t... 12 more",
            "Caused by: com.sun.mail.smtp.SMTPAddressFailedException: 550 5.7.1 denied",
        ]
        out = msgs(lines)
        assert out == ["\n".join(lines)]

    def test_php_backtraces(self):
        # test_smart_multi_line.c:344 test_php_backtrace
        a = [
            "exception 'Exception' with message 'Custom exception' in /home/joe/work/test-php/test.php:5",
            "Stack trace:",
            "#0 /home/joe/work/test-php/test.php(9): func1()",
            "#1 /home/joe/work/test-php/test.php(13): func2()",
            "#2 {main}",
        ]
        b = [
            "PHP Fatal error:  Uncaught exception 'Exception' with message 'message' in errors.php:60",
            "Stack trace:",
            "#0 [internal function]: ErrorEntryGenerator::{closure}()",
            "#1 errors.php(20): call_user_func_array(Object(Closure), Array)",
            "#4 {main}",
            "  thrown in errors.php on line 60",
        ]
        out = msgs(a + b)
        assert out == ["\n".join(a), "\n".join(b)]

    def test_js_backtrace(self):
        # test_smart_multi_line.c:390 test_js_backtrace (V8 'at' frames
        # ride the java rules)
        lines = [
            "ReferenceError: myArray is not defined",
            "  at next (/app/node_modules/express/lib/router/index.js:256:14)",
            "  at /app/node_modules/express/lib/router/index.js:615:15",
            "  at Layer.handle [as handle_request] (/app/node_modules/express/lib/router/layer.js:95:5)",
            "  at /app/app.js:52:3",
        ]
        assert msgs(lines) == ["\n".join(lines)]

    def test_go_panic(self):
        lines = [
            "panic: my panic",
            "",
            "goroutine 4 [running]:",
            "panic(0x45cb40, 0x47ad70)",
            "\t/usr/local/go/src/runtime/panic.go:542 +0x46c fp=0xc42003f7b8 sp=0xc42003f710",
            "main.main.func1(0xc420024120)",
            "\t/tmp/sandbox/main.go:12 +0x39 fp=0xc42003f7d8 sp=0xc42003f7b8",
            "next log line",
        ]
        out = msgs(lines)
        assert out == ["\n".join(lines[:7]), "next log line"]

    def test_back_to_back_traces_split(self):
        # a new trace directly after another (no separator line) rewinds
        lines = [
            "Traceback (most recent call last):",
            'File "a.py", line 1, in <module>',
            "  x()",
            "Traceback (most recent call last):",
            'File "b.py", line 2, in <module>',
            "  y()",
        ]
        out = msgs(lines)
        assert out == ["\n".join(lines[:3]), "\n".join(lines[3:])]

    def test_fsm_state_resets_between_streams(self):
        fsm = SmartMultiLine()
        fsm.feed("Traceback (most recent call last):")
        assert fsm.flush() == [["Traceback (most recent call last):"]]
        assert fsm.state == "start_state"
        assert fsm.feed("plain") == [["plain"]]


class TestRegexpGarbageModes:
    def _run(self, mode, lines, **kw):
        j = MultiLineJoiner(mode=mode, **kw)
        t = pa.table({"text": pa.array(lines, type=pa.string())})
        return j(t).column("text").to_pylist()

    def test_prefix_garbage_drops_match_and_tail(self):
        # regexp-multi-line.c:27-34: offset = garbage match START — the
        # match and everything after it are dropped
        out = self._run("prefix-garbage",
                        ["first part", "more --END-- trailing junk", "next msg --END--"],
                        prefix_re=r"^\S", garbage_re=r"--END--")
        assert out == ["first part\nmore ", "next msg "]

    def test_prefix_suffix_keeps_the_suffix(self):
        # regexp-multi-line.c:37-44: offset = match END — suffix stays
        out = self._run("prefix-suffix",
                        ["first part", "more --END-- trailing junk", "next msg --END--"],
                        prefix_re=r"^\S", garbage_re=r"--END--")
        assert out == ["first part\nmore --END--", "next msg --END--"]

    def test_garbage_check_precedes_prefix_rewind(self):
        # regexp-multi-line.c:68-77: on a continuation line the garbage
        # check runs FIRST — a line carrying the terminator joins the
        # pending message even if it also matches the prefix
        out = self._run("prefix-garbage",
                        ["MSG one", " cont", "MSG two --END--", "MSG three"],
                        prefix_re=r"^MSG", garbage_re=r"--END--")
        assert out == ["MSG one\n cont\nMSG two ", "MSG three"]

    def test_prefix_rewinds_unterminated_message(self):
        # a prefix match mid-accumulation (no garbage on the line)
        # extracts the pending message and starts a new one
        out = self._run("prefix-garbage",
                        ["MSG one", " cont", "MSG two", " tail --END--"],
                        prefix_re=r"^MSG", garbage_re=r"--END--")
        assert out == ["MSG one\n cont", "MSG two\n tail "]

    def test_garbage_on_initial_line(self):
        out = self._run("prefix-suffix", ["a END", "b END"],
                        prefix_re=r"^\S", garbage_re=r"END")
        assert out == ["a END", "b END"]

    def test_mode_validation(self):
        with pytest.raises(ValueError):
            MultiLineJoiner(mode="nope")

    def test_null_garbage_groups_on_prefix_only(self):
        # multi_line_pattern_find on a NULL pattern returns FALSE
        # (regexp-multi-line.c:86-87): without garbage/suffix a message
        # ends only at the next prefix — the mbox shape
        j = MultiLineJoiner(mode="prefix-garbage", prefix_re="^From ")
        assert j._group(["From a", "x", "From b"]) == [["From a", "x"],
                                                       ["From b"]]


class TestSmartModeInJoiner:
    def test_smart_mode_through_batch_operator(self):
        lines = [
            "ok line",
            "Traceback (most recent call last):",
            'File "a.py", line 1, in <module>',
            "  boom()",
            "KeyError: 'x'",
            "another ok line",
        ]
        j = MultiLineJoiner(mode="smart")
        t = pa.table({"text": pa.array(lines, type=pa.string()),
                      "src": pa.array([f"f{i}" for i in range(len(lines))])})
        out = j(t)
        assert out.column("text").to_pylist() == [
            "ok line", "\n".join(lines[1:5]), "another ok line"]
        assert out.column("n_lines").to_pylist() == [1, 4, 1]
        # carried columns take the FIRST line's value
        assert out.column("src").to_pylist() == ["f0", "f1", "f5"]
