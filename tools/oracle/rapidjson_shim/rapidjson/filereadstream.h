#ifndef RAPIDJSON_SHIM_FILEREADSTREAM_H
#define RAPIDJSON_SHIM_FILEREADSTREAM_H
#include <cstdio>

namespace rapidjson {

class FileReadStream {
public:
    FileReadStream(FILE *fp, char *buffer, size_t bufferSize)
        : fp_(fp), buf_(buffer), bufSize_(bufferSize), pos_(0), len_(0), count_(0) {
        fill();
    }

    char Peek() const { return pos_ < len_ ? buf_[pos_] : '\0'; }

    char Take() {
        if (pos_ >= len_) return '\0';
        char c = buf_[pos_++];
        count_++;
        if (pos_ >= len_) fill();
        return c;
    }

    size_t Tell() const { return count_; }

private:
    void fill() {
        len_ = fread(buf_, 1, bufSize_, fp_);
        pos_ = 0;
    }
    FILE *fp_;
    char *buf_;
    size_t bufSize_, pos_, len_, count_;
};

} // namespace rapidjson
#endif
