"""GPT-OSS channel-filter unit tests (client-side, no server)."""


def _run_filter(stream, sizes):
    from krasis_tpu.chat import ChannelFilter

    f = ChannelFilter()
    out, i = [], 0
    for n in sizes:
        out.append(f.feed(stream[i:i + n]))
        i += n
    out.append(f.feed(stream[i:]))
    out.append(f.flush())
    return "".join(out)


def test_channel_filter_final_only():
    s = ("<|channel|>analysis<|message|>let me think...<|end|>"
         "<|start|>assistant<|channel|>final<|message|>Paris.")
    for sizes in ([len(s)], [1] * len(s), [7] * (len(s) // 7 + 1),
                  [3, 40, 2, 100]):
        assert _run_filter(s, sizes) == "Paris.", sizes


def test_channel_filter_passthrough_plain_text():
    s = "plain answer with <brackets| but no channel markup"
    assert _run_filter(s, [5] * (len(s) // 5 + 1)) == s


def test_channel_filter_multiple_turns():
    s = ("<|channel|>analysis<|message|>hmm<|end|>"
         "<|start|>assistant<|channel|>final<|message|>A<|return|>")
    assert _run_filter(s, [2] * (len(s) // 2 + 1)) == "A"
