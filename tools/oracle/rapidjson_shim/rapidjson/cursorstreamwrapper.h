#ifndef RAPIDJSON_SHIM_CURSORSTREAMWRAPPER_H
#define RAPIDJSON_SHIM_CURSORSTREAMWRAPPER_H

namespace rapidjson {

template<typename Stream>
class CursorStreamWrapper {
public:
    explicit CursorStreamWrapper(Stream &s) : s_(s) {}
    char Peek() const { return s_.Peek(); }
    char Take() {
        char c = s_.Take();
        if (c == '\n') line_++;
        return c;
    }
    size_t Tell() const { return s_.Tell(); }
    size_t GetLine() const { return line_; }
    size_t GetColumn() const { return 0; }

private:
    Stream &s_;
    size_t line_ = 1;
};

} // namespace rapidjson
#endif
