"""Callback (SAX-style) parsing surface.

The reference's own HTMLParser callback API is unusable (every entry point
raises AttributeError because __init__ skips the dataclass __post_init__ —
see SURVEY.md §2-B), so these tests pin OUR behavior to the reference
middleware's documented intent, plus one test that proves the reference
surface really is dead (guarding the survey claim)."""
import pytest

from pyxml_spark.engine.callbacks import CallbackParser
from tests.conftest import has_reference


class Recorder(CallbackParser):
    def __init__(self, **kw):
        super().__init__(**kw)
        self.events = []

    def handle_startag(self, tag, attrs):
        self.events.append(('start', tag, dict(attrs)))

    def handle_endtag(self, tag):
        self.events.append(('end', tag))

    def handle_data(self, data):
        self.events.append(('data', data))

    def handle_comment(self, text):
        self.events.append(('comment', text))

    def handle_decl(self, decl):
        self.events.append(('decl', decl))

    def unknown_decl(self, data):
        self.events.append(('unknown', data))

    def handle_pi(self, data):
        self.events.append(('pi', data))

    def handle_charref(self, name):
        self.events.append(('charref', name))

    def handle_entityref(self, name):
        self.events.append(('entity', name))


def test_event_stream_html():
    p = Recorder()
    p.feed(b'<!DOCTYPE html><div class="x"><!--c--><p>hi</p><br>t</div>')
    p.close()
    assert p.events == [
        ('decl', 'DOCTYPE html'),
        ('start', 'div', {'class': 'x'}),
        # reference comment-lexer quirk: the opener's third '-' stays in the
        # value (lexer.py:101-120)
        ('comment', '-c'),
        ('start', 'p', {}),
        ('data', 'hi'),
        ('end', 'p'),
        # void tag arrives as startendtag -> default start+end expansion
        ('start', 'br', {}),
        ('end', 'br'),
        ('data', 't'),
        ('end', 'div'),
    ]


def test_xml_mode_keeps_void_open():
    p = Recorder(mode='xml')
    p.feed('<a><br>x</br></a>')
    p.close()
    assert p.events == [
        ('start', 'a', {}), ('start', 'br', {}), ('data', 'x'),
        ('end', 'br'), ('end', 'a')]


def test_convert_charefs_true_decodes():
    p = Recorder()
    p.feed('<p title="a&amp;b">x &#65; &amp; y</p>')
    p.close()
    assert ('start', 'p', {'title': 'a&b'}) in p.events
    assert ('data', 'x A & y') in p.events


def test_convert_charefs_false_routes_and_strips():
    p = Recorder(convert_charefs=False)
    p.feed('<p>x &#65; &amp; y</p>')
    p.close()
    # charrefs first, then entityrefs, full &...; token passed (reference
    # middleware order, html/parser.py:75-81)
    assert p.events == [
        ('start', 'p', {}),
        ('charref', '&#65;'),
        ('entity', '&amp;'),
        ('data', 'x   y'),
        ('end', 'p'),
    ]


def test_pi_and_unknown_decl():
    p = Recorder(mode='xml')
    p.feed('<!weird thing><a><?php echo 1?></a>')
    p.close()
    assert ('unknown', 'weird thing') in p.events
    assert ('pi', 'php echo 1') in p.events


def test_script_rawtext_reaches_data():
    p = Recorder()
    p.feed('<script>if (a<b) { x("</div>"); }</script>')
    p.close()
    # raw-text mode: everything up to the literal </script> is ONE data
    # event; the embedded </div> stays inside it
    assert ('data', 'if (a<b) { x("</div>"); }') in p.events


@pytest.mark.skipif(not has_reference(), reason='reference not importable')
def test_reference_callback_surface_is_dead():
    """guards the SURVEY §2-B claim that justifies replacing, not porting"""
    from pyxml.html.parser import HTMLParser
    p = HTMLParser()
    with pytest.raises(AttributeError):
        p.feed(b'<p>x</p>')
    with pytest.raises(AttributeError):
        p.close()
